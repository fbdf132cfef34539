"""Getting started — the reference tutorial, Spark-first.

Mirrors /root/reference/docs/source/getting_started/01-getting-started.md:
declare a model, load two systems, diff them, inspect the diff, sync, and
confirm convergence — except each "system" is a DataFrame (any spark.read
source) and the destination is a transactional SnapshotTable, so the same
five calls run unchanged on a laptop or a 1000-executor cluster.

Run:  PYTHONPATH=. python examples/01_getting_started.py
"""

import tempfile

from pyspark.sql import functions as F

from diffsync_spark import Engine, ModelSchema, SnapshotTable, build_session

# 1. Declare the model (reference: DiffSyncModel class attributes
#    _modelname/_identifiers/_shortname/_attributes; __init__.py:61-159).
#    Undeclared columns (like the tutorial's database_pk) ride along but
#    are never compared.
SITE = ModelSchema(
    name="site",
    identifiers=("site_name",),
    attributes=("contact_phone",),
)


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4)

    # 2. Two "systems" (reference: BackendA/BackendB adapters with load()).
    #    Any spark.read source works; inline rows keep the example small.
    backend_a = spark.createDataFrame(
        [
            ("nyc", "+1 212 555 0101", 11),
            ("sfo", "+1 415 555 0102", 12),
            ("lax", None, 13),
        ],
        "site_name string, contact_phone string, database_pk int",
    )
    backend_b = spark.createDataFrame(
        [
            ("nyc", "+1 212 555 0199", 97),  # different phone → update
            ("sfo", "+1 415 555 0102", 98),  # same → noop
            ("atl", "+1 404 555 0103", 99),  # missing from A → delete
        ],
        "site_name string, contact_phone string, database_pk int",
    )

    # 3. The destination is a real table (reference: BackendB's store).
    with tempfile.TemporaryDirectory() as tmp:
        table = SnapshotTable.create(
            spark, f"{tmp}/site_table", SITE,
            schema=backend_b.schema, n_buckets=4,
        )
        table.merge(
            backend_b.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="bootstrap", batch_id=0,
        )
        engine = Engine(spark, SITE, table)

        # 4. Diff — reference `b.diff_from(a)`; one Catalyst plan, no
        #    driver-side iteration.
        d = engine.diff_from(backend_a)
        print("--- diff (actionable rows) ---")
        d.filter("op <> 'noop'").select(
            "site_name", "op", "changed_cols"
        ).show(truncate=False)

        # 5. Sync — reference `b.sync_from(a)`; one set-based MERGE.
        engine.sync_from(backend_a, checkpoint_id="tutorial", batch_id=1)
        print("--- converged state ---")
        table.read().orderBy("site_name").show()

        # convergence check, as the reference's tests assert
        assert not engine.diff_from(backend_a).filter("op <> 'noop'").count()
        print("re-diff is empty: systems are in sync")

    spark.stop()


if __name__ == "__main__":
    main()
