"""Scalar kernels shared by the oracle and the Spark operators (these play
the role the external libraries play in the reference, e.g. latex2mathml)."""
