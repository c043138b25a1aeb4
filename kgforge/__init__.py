"""kgforge — a PySpark-native knowledge-graph construction engine.

Re-expresses the pipeline semantics of guillaume-be/rust-bert (reference at
/root/reference, studied for behavior only) as Spark DataFrame plans plus
vectorized pandas/Arrow UDFs:

  stage 1  HTML -> text extraction  (byte-identical per url)      kgforge.extract
  stage 2  batched token-classification NER                       kgforge.ner
  stage 3  zero-shot (subj, pred, obj) triple scoring             kgforge.triples
  stage 4  entity linking (broadcast alias join + ANN rerank)     kgforge.link
  stage 5  connected-component canonicalization + materialize     kgforge.canon

All pipeline math (sliding-window featurization, softmax/argmax decoding,
sub-token consolidation, BIOES chunking, NLI entailment scoring, masked mean
pooling) lives in pure, numpy-vectorized functions that are unit-tested
locally and invoked inside `mapInPandas` / iterator `pandas_udf` stages — one
model instance per Python worker, no per-row Python.
"""

__version__ = "0.1.0"
