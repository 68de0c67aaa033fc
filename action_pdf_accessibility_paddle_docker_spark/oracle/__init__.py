"""Pure-Python, single-process oracle implementing the reference extraction
semantics. Used only in tests/goldens — never on the Spark hot path. The
Spark kernels in ``operators/`` are an independent vectorized implementation;
per-turn equality between the two is the correctness gate.
"""
