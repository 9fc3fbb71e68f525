"""Bare-operator stand-ins for registry names retired by the
round-13 retire-or-merge wave (PARITY.md).

The merged registry entries (ann_cosine_topk, minhash_near_dup_pairs,
simhash_hamming_pairs, hybrid_search_rrf3, referential_integrity_audit)
run BOTH code paths under an ``arm`` discriminator, so correctness
coverage is unchanged; these callables keep the retired names usable
in the perf tools (scale_check decade sweeps, plan_audit) so their
measurement series stay unbroken. bench.py carries its own EXTRA_ROWS
twins of the same shapes.
"""

from __future__ import annotations


def _bare_ops():
    from api_kakfa_spark_airflow_s3_athena_spark.operators import dedup as DD
    from api_kakfa_spark_airflow_s3_athena_spark.operators import retrieval as RET
    from api_kakfa_spark_airflow_s3_athena_spark.operators import similarity as SIM
    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    def simhash_arrow(spark, sf_dir):
        return DD.simhash_hamming_pairs_arrow(
            load_table(spark, sf_dir, "documents"), max_distance=3
        )

    def minhash_arrow(spark, sf_dir):
        return DD.minhash_dedup_pairs_arrow(
            load_table(spark, sf_dir, "documents"),
            threshold=0.5,
            num_hashes=32,
            bands=8,
        )

    def rrf2(spark, sf_dir):
        return RET.hybrid_rrf_topk(
            load_table(spark, sf_dir, "documents"),
            load_table(spark, sf_dir, "embeddings"),
            ["spark", "customer", "slow"],
            query_vec_id=7,
            k=10,
            n_arm=20,
        )

    def ann_arrow(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return SIM.brute_force_topk_arrow(
            emb.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("query_id"), F.col("embedding")
            ),
            emb,
            k=10,
        )

    return {
        "simhash_hamming_pairs_arrow": simhash_arrow,
        "minhash_near_dup_pairs_arrow": minhash_arrow,
        "hybrid_search_rrf": rrf2,
        "ann_cosine_topk_arrow": ann_arrow,
    }


def get(name):
    """The bare operator for a retired registry name, or None."""
    return _bare_ops().get(name)
