"""Message-bus client seam (A2 producer + A3 consumer as ONE protocol).

The reference talks to Pulsar through a single client object that hands
out a producer (pkg/pulsar/pulsar.go:75-121 -- create producer,
``SendMessage``, ``Flush``) and a consumer (pkg/pulsar/pulsar.go:226-263
-- receive loop, ``Ack`` on success). This module declares the Spark
analog of that client as an explicit protocol, so swapping the sandbox's
file-backed bus for a real broker is ONE constructor change, not a
pipeline rewrite:

  reference client surface            -> MessageBusClient
  -------------------------------------------------------
  producer.SendMessage / Flush        -> sink() -> foreachBatch callable
                                         (send per row, flush per
                                         partition at micro-batch end)
  consumer.Receive / Ack              -> source(spark) -> streaming
                                         DataFrame (key, payload,
                                         tenant_id); the "ack" is the
                                         checkpoint commit after the
                                         micro-batch's foreachBatch
                                         returns -- the same
                                         at-least-once contract as the
                                         reference's Ack-after-write

Two implementations ship:

  - :class:`FileBus` (default): the sandbox analog. Publishes JSONL part
    files keyed by partition key, reads them back as a file stream.
    Faithful to the broker semantics that matter to the pipeline
    (keyed messages, replayable, at-least-once).
  - :class:`BrokerBus`: the drop-in for a REAL broker. Takes an
    executor-side ``client_factory`` for the producer (see
    ``produce.BrokerPublisher``) and a ``source_factory(spark)`` for the
    consumer (typically a connector's ``spark.readStream.format(...)``),
    e.g. for Apache Pulsar's Spark connector::

        bus = BrokerBus(
            client_factory=make_pulsar_producer,     # runs on executors
            source_factory=lambda spark: spark.readStream
                .format("pulsar")
                .option("service.url", "pulsar://broker:6650")
                .option("topics", "metrics")
                .load()
                .selectExpr("CAST(__key AS STRING) AS key",
                            "CAST(value AS STRING) AS payload",
                            "properties['tenant'] AS tenant_id"),
        )

``AppConfig`` accepts the client as the ``--pulsar.client`` flag: the
default ``file``, or a ``module:attribute`` dotted path to a factory
``(bus_dir: str) -> MessageBusClient`` (the kingpin-style extension
point; resolved by :func:`resolve_bus`).
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class MessageBusClient(Protocol):
    """The two-sided bus client the pipelines are written against."""

    def sink(self) -> Callable[[DataFrame, int], None]:
        """A2: a foreachBatch callable publishing (key, payload,
        tenant_id) rows. Must raise on delivery failure so the
        micro-batch fails and replays (the reference's
        Flush-before-ack)."""
        ...

    def source(self, spark: SparkSession) -> DataFrame:
        """A3: a streaming DataFrame of (key string, payload string,
        tenant_id string). Progress is acked via the consuming query's
        checkpoint."""
        ...


class FileBus:
    """File-backed bus (the sandbox default): JSONL part files under
    ``bus_dir``, published per micro-batch and re-read as a file stream."""

    def __init__(self, bus_dir: str, max_files_per_trigger: int = 64):
        self.bus_dir = bus_dir
        self.max_files_per_trigger = max_files_per_trigger

    def sink(self) -> Callable[[DataFrame, int], None]:
        from .produce import FilePublisher

        return FilePublisher(self.bus_dir)

    def source(self, spark: SparkSession) -> DataFrame:
        from .consume import read_payload_stream

        return read_payload_stream(
            spark, self.bus_dir, max_files=self.max_files_per_trigger
        )


class BrokerBus:
    """Real-broker client: producer via an executor-side factory (one
    cached client per python worker, A5 connection reuse), consumer via a
    connector ``source_factory``. Either side may be omitted when only
    one direction is deployed."""

    def __init__(
        self,
        client_factory: Callable | None = None,
        source_factory: Callable[[SparkSession], DataFrame] | None = None,
        cache_key: str = "default",
    ):
        self.client_factory = client_factory
        self.source_factory = source_factory
        self.cache_key = cache_key

    def sink(self) -> Callable[[DataFrame, int], None]:
        if self.client_factory is None:
            raise ValueError("BrokerBus has no client_factory (producer side)")
        from .produce import BrokerPublisher

        return BrokerPublisher(self.client_factory, cache_key=self.cache_key)

    def source(self, spark: SparkSession) -> DataFrame:
        if self.source_factory is None:
            raise ValueError("BrokerBus has no source_factory (consumer side)")
        return self.source_factory(spark)


def resolve_bus(
    spec: str, bus_dir: str, client_options: dict | None = None
) -> MessageBusClient:
    """Resolve a ``--pulsar.client`` value to a client instance.

    ``"file"`` -> :class:`FileBus`; ``"pkg.module:attr"`` -> import the
    attribute and call it with ``bus_dir`` (it must return a
    MessageBusClient). The dotted form is how a deployment selects its
    broker adapter without this repo importing any broker SDK.

    ``client_options`` (AppConfig.client_options(): URL, timeouts, TLS
    material -- reference pkg/app/pulsar.go:96-115) is passed as a
    second argument to factories that accept one; single-argument
    factories and the FileBus (no connection to secure) ignore it."""
    if spec in ("", "file"):
        return FileBus(bus_dir)
    mod_name, sep, attr = spec.partition(":")
    if not sep:
        raise ValueError(
            f"unknown pulsar.client {spec!r}: expected 'file' or 'module:factory'"
        )
    import importlib
    import inspect

    factory = getattr(importlib.import_module(mod_name), attr)
    try:
        takes_options = len(inspect.signature(factory).parameters) >= 2
    except (TypeError, ValueError):
        takes_options = False
    if takes_options:
        bus = factory(bus_dir, client_options or {})
    else:
        bus = factory(bus_dir)
    if not isinstance(bus, MessageBusClient):
        raise TypeError(
            f"pulsar.client factory {spec!r} returned {type(bus).__name__}, "
            "which lacks the MessageBusClient surface (sink/source)"
        )
    return bus
