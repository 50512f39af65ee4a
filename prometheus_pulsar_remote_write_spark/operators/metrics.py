"""A6 observability (reference pkg/metrics/metrics.go:20-59).

The reference exports five per-tenant Prometheus metric families:
received/sent/failed sample counters, a retry counter, and a send-duration
histogram. The Spark-native mapping:

  - per-batch dataflow counts ride the query itself via ``observe()``
    (no extra action, no second scan): ``Observation`` for batch jobs,
    ``StreamingQueryListener`` + named observations for streams;
  - per-tenant delivery counters live in the sink (RemoteWriteSink.sent /
    .failed -- D2/D6 bookkeeping), aggregated here into snapshots;
  - send-duration histogram: fixed buckets accumulated in the sink
    (driver-side, one value per HTTP POST -- bounded cardinality).

Nothing here touches the data path: observe() metrics are computed by the
executors as a side output of the existing plan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: send-duration histogram bucket upper bounds, seconds (prometheus-style)
DURATION_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


def sample_metrics_exprs() -> list:
    """The observed-metric expressions attached to a sample DataFrame."""
    return [
        F.count(F.lit(1)).alias("n_samples"),
        # observe() rejects DISTINCT aggregates; approx is the idiom
        F.approx_count_distinct("tenant_id").alias("n_tenants"),
        F.sum("value").alias("sum_value"),
        F.min("timestamp").alias("min_ts"),
        F.max("timestamp").alias("max_ts"),
    ]


def observe_samples(df: DataFrame, name: str = "samples") -> tuple[DataFrame, Observation | None]:
    """Attach sample-flow metrics to a plan.

    Batch: returns (df, Observation) -- read ``observation.get`` after an
    action. Streaming: returns (df, None) -- metrics arrive per micro-batch
    in ``QueryProgressEvent.observedMetrics[name]`` (see MetricsListener).
    """
    if df.isStreaming:
        return df.observe(name, *sample_metrics_exprs()), None
    obs = Observation(name)
    return df.observe(obs, *sample_metrics_exprs()), obs


class MetricsListener:
    """StreamingQueryListener capturing per-batch progress + observed metrics.

    Collects (batch_id, numInputRows, batchDuration, observedMetrics) per
    progress event; ``totals()`` aggregates. Register with
    ``spark.streams.addListener(listener.as_listener())``.
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def _on_progress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "observed": {k: v.asDict() for k, v in (p.observedMetrics or {}).items()},
            }
        )

    def as_listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                outer._on_progress(event)

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        return _L()

    def totals(self) -> dict:
        out = {"num_input_rows": 0, "n_samples": 0}
        for p in self.progress:
            out["num_input_rows"] += p["num_input_rows"] or 0
            for metrics in p["observed"].values():
                out["n_samples"] += metrics.get("n_samples") or 0
        return out


@dataclass
class DeliveryMetrics:
    """Per-tenant delivery counters + send-duration histogram (the sink-side
    half of the reference's metric families)."""

    received: dict = field(default_factory=dict)
    sent: dict = field(default_factory=dict)
    failed: dict = field(default_factory=dict)
    retries: int = 0
    duration_buckets: list = field(
        default_factory=lambda: [0] * (len(DURATION_BUCKETS) + 1)
    )
    duration_sum: float = 0.0
    duration_count: int = 0

    def count_received(self, tenant_id: str, n: int = 1) -> None:
        self.received[tenant_id] = self.received.get(tenant_id, 0) + n

    def count_sent(self, tenant_id: str, n: int = 1) -> None:
        self.sent[tenant_id] = self.sent.get(tenant_id, 0) + n

    def count_failed(self, tenant_id: str, n: int = 1) -> None:
        self.failed[tenant_id] = self.failed.get(tenant_id, 0) + n

    def count_retry(self) -> None:
        self.retries += 1

    def observe_duration(self, seconds: float) -> None:
        self.duration_sum += seconds
        self.duration_count += 1
        for i, bound in enumerate(DURATION_BUCKETS):
            if seconds <= bound:
                self.duration_buckets[i] += 1
                return
        self.duration_buckets[-1] += 1

    def time_send(self):
        """Context manager: times one POST into the histogram."""
        metrics = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.monotonic()
                return self

            def __exit__(self, *exc):
                metrics.observe_duration(time.monotonic() - self.t0)
                return False

        return _Timer()

    def snapshot(self) -> dict:
        return {
            "received": dict(self.received),
            "sent": dict(self.sent),
            "failed": dict(self.failed),
            "retries": self.retries,
            "send_duration": {
                "buckets": list(self.duration_buckets),
                "sum": self.duration_sum,
                "count": self.duration_count,
            },
        }
