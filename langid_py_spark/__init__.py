"""langid_py_spark — a PySpark-native language-ID + quality-filter engine.

A from-scratch reimplementation of the data-processing capabilities of
``saffsd/langid.py`` (Lui & Baldwin, ACL 2012), re-expressed as idiomatic
Spark DataFrame dataflow:

* byte 1-4-gram features tokenized by an Aho-Corasick-style DFA compiled
  into NumPy transition arrays (reference: ``langid/train/scanner.py``,
  consumed at ``langid/langid.py :: instance2fv``),
* multinomial naive-Bayes scoring as ONE dense log-probability matmul per
  Arrow batch (reference: ``langid/langid.py :: nb_classprobs``),
* embedded in a quality-filter pipeline (heuristic keep/drop rules, char
  n-gram perplexity, regex PII scrub, salted conversation-level language
  vote) per BASELINE.json::north_rule.

Layout:
    core/       pure-NumPy engine — also the single-process test oracle
    spark/      Arrow-UDF scorer + Catalyst-expression operators + pipeline
    operators/  training-data ops (dedup, similarity, text stats, training)
    fixtures/   deterministic synthetic transcript generator (seed=42)
    data/       trained fallback model artifacts (model.npz, lm.npz)
"""

__version__ = "0.1.0"
