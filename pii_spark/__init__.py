"""pii_spark — the PySpark-native extraction engine.

Layers (SURVEY.md §7):
* ``session``   — tuned SparkSession builder (AQE, Arrow, shuffle partitions).
* ``schemas``   — pages / results / lineage StructTypes (FIXTURES.md).
* ``synth``     — deterministic synthetic web-pages corpus generator.
* ``extract``   — the flagship job: salted repartition by url-hash → ONE
  shuffle-free ``mapInPandas`` pass (html→text→chunks→NER→decode→spans→
  decision) → results + per-partition lineage.
* ``resume``    — checkpoint-resume via committed-url anti-join.
* ``review``    — broadcast semi/anti review join (reference J3).
* ``evaljob``   — eval metrics (reference A4-A7).
* ``queries``   — oracle-checked query registry for the driver contract.
* ``ops``       — training-data-pipeline operators: dedup, similarity,
  text stats, multimodal plumbing.

Semantics live in ``pii_core`` (pure, Spark-free); this package only
orchestrates distribution — so byte-identical per-url output is guaranteed
by construction at any partition count.
"""
