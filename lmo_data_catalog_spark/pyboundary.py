"""Driver-side Python↔JVM boundary tuning (optimization guide §4).

Every ``F.col``/``F.lit``/Column method in a builder is one or more
py4j round trips. Two measured pathologies on the gateway socket
(r14, this host):

1. **Nagle's algorithm**: py4j never sets ``TCP_NODELAY``, so small
   command/response pairs interact with delayed ACK — a raw
   ``jvm.System.currentTimeMillis()`` round trip measured 2.7 ms;
   with NODELAY it is 0.79 ms (3.4×). Builders issue thousands of
   such calls, so this tax dominated "build_s" in the r14 baseline
   profile (144 s of the 272 s suite was driver-side build).
2. **Uncached JVM function reflection**: PySpark's
   ``_get_jvm_function`` resolves ``getattr(jvm.functions, name)``
   freshly on EVERY ``F.*`` call — two reflection round trips before
   the actual invocation (measured: 3 round trips per ``F.lit``).
   The resolved ``JavaMember`` is stable per gateway, so caching it
   cuts every builtin call to one round trip.

Both patches are semantics-free: a socket option and a memo of an
idempotent reflection lookup. Nothing about query plans, data, or
results changes — only driver-side latency.

``apply()`` patches the py4j connection classes (future connections)
and PySpark's function resolver; it is idempotent and needs no live
SparkContext. ``fix_live_connections()`` retrofits NODELAY onto the
connection pool of an already-running gateway (the driver may create
its SparkSession before importing this package); it is cheap enough
to call per-builder.
"""

from __future__ import annotations

import socket as _socket
import weakref

_applied = False


def _set_nodelay(sock) -> None:
    try:
        sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
    except (OSError, AttributeError):
        pass  # closed/SSL-detached socket — nothing to tune


def apply() -> None:
    global _applied
    if _applied:
        return
    _applied = True
    _patch_nodelay()
    _patch_jvm_function_cache()


def _patch_nodelay() -> None:
    from py4j import clientserver, java_gateway

    orig_cs = clientserver.ClientServerConnection.connect_to_java_server

    def connect_to_java_server(self):
        orig_cs(self)
        _set_nodelay(self.socket)

    clientserver.ClientServerConnection.connect_to_java_server = (
        connect_to_java_server
    )

    orig_gw = java_gateway.GatewayConnection.start

    def start(self):
        orig_gw(self)
        _set_nodelay(self.socket)

    java_gateway.GatewayConnection.start = start


def fix_live_connections() -> None:
    """Set NODELAY on the active gateway's pooled connections (those
    created before :func:`apply` ran). Idempotent, O(pool size)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return
    client = getattr(getattr(sc, "_gateway", None), "_gateway_client", None)
    for conn in list(getattr(client, "deque", []) or []):
        sock = getattr(conn, "socket", None)
        if sock is not None:
            _set_nodelay(sock)


def _patch_jvm_function_cache() -> None:
    from pyspark.sql.functions import builtin as _builtin

    orig = _builtin._get_jvm_function
    # keyed by the gateway's JVMView so a new SparkContext (new
    # gateway) never sees another gateway's stale JavaMembers; the
    # WeakKeyDictionary lets a stopped session's view (and its cached
    # members) be collected.
    per_view: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

    def cached_get_jvm_function(name, sc):
        jvm = sc._jvm
        try:
            names = per_view.setdefault(jvm, {})
        except TypeError:  # un-weakref-able view — fall through
            return orig(name, sc)
        fn = names.get(name)
        if fn is None:
            fn = orig(name, sc)
            names[name] = fn
        return fn

    _builtin._get_jvm_function = cached_get_jvm_function
