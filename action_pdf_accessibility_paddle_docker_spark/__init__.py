"""PySpark-native document/transcript extraction engine.

A from-scratch re-expression of the extraction semantics of
``pdfix/action-pdf-accessibility-paddle-docker`` (reference, read-only at
/root/reference) as vectorized pandas/Arrow UDF stages over a table of
multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  config       -- label/class maps, thresholds, shared constants
  oracle/      -- pure-Python single-process reference-semantics oracle
                  (golden source for per-turn text-equality tests)
  functions/   -- scalar kernels (FNV-1a, geometry, mathml, text stats)
  operators/   -- vectorized per-batch kernels + dedup/similarity/multimodal
  plans/       -- DataFrame pipeline builders (extraction, lineage, resume)
  sources/     -- deterministic synthetic transcript generator + readers
  streaming/   -- Structured Streaming variant of the extraction pipeline
"""

__version__ = "0.1.0"
