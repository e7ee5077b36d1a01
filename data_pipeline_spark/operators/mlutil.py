"""Shared pyspark.ml hygiene helpers.

`strip_training_summary` exists because a freshly-fit model (RandomForest,
KMeans, ...) carries a `trainingSummary` whose Impl holds a hard reference
to the *SparkSession*. `model.transform` closures capture the model, so
every task serializes model -> summary -> SparkSession -- and the session
is only serializable while its lazy `observationManager`
(org.apache.spark.sql.classic.ObservationManager, not Serializable) is
uninitialized. Any earlier `Observation`/observe use on the shared session
flips that, and every later ML transform dies with
`SparkException: Task not serializable` (observed as an order-dependent
test flake; at scale it would be an order-dependent JOB failure whenever a
fitted model is used in a session that also runs observe-instrumented
commits, as the lake's merge path does).

The summary is a training-time diagnostic; production scoring never wants
it shipped to executors. Stripping it after fit() is both the bug fix and
the right scale posture (smaller task closures, no session reference in
the serialized graph).
"""

from __future__ import annotations


def strip_training_summary(model):
    """Drop the model's training summary in place; returns the model.

    Uses `HasTrainingSummary.setSummary(None)` (private[spark] in Scala --
    public in bytecode, reachable via py4j). Falls back to a no-op if the
    model has no summary slot.
    """
    jobj = getattr(model, "_java_obj", None)
    if jobj is None:
        return model
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        jobj.setSummary(jvm.scala.Option.apply(None))
    except Exception:
        # Older/newer API without setSummary: leave the model as-is rather
        # than fail training; transform still works in unpoisoned sessions.
        pass
    return model
