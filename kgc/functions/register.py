"""op-49: expose the engine's UDFs + dimension views to spark.sql().

After register_all(spark), the full extraction surface is usable from SQL —
parity between the DataFrame API and the SQL API (same Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession, sf: float = 0.001) -> None:
    from kgc.operators.dedup import simhash_udf
    from kgc.operators.extract import detect_mentions_udf
    from kgc.operators.link import score_links_udf
    from kgc.sources.synth import alias_catalog, part_of_dim

    spark.udf.register("kgc_detect_mentions", detect_mentions_udf)
    spark.udf.register("kgc_score_link", score_links_udf)
    spark.udf.register("kgc_simhash", simhash_udf)
    part_of_dim(spark).createOrReplaceTempView("kgc_part_of")
    alias_catalog(spark, sf).createOrReplaceTempView("kgc_alias_catalog")
