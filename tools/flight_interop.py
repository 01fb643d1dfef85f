#!/usr/bin/env python3
"""Upstream-client interop proof for the hand-rolled gRPC/HTTP/2 Flight
server (graft.sources.FlightGrpc).

Every loopback spec validates our server against our own client, so a
mirrored misreading of the gRPC/Flight conventions would pass. This
script drives a STOCK `pyarrow.flight.FlightClient` (an independent
implementation of the HTTP/2 session, gRPC framing, Flight protobufs
and both Flight auth flows) through the full verb set, mirroring the
reference's own client usage (reference python/neo4j_arrow.py: Basic
headers on every call, do_action tickets as serialized Ticket protos,
CypherMessage as u16-length-prefixed fields, gds write via
do_put-on-ticket) — byte format re-derived here, no code copied.

Usage: python3 tools/flight_interop.py [sfDir] [--keep-server]
Writes INTEROP.json (step -> pass/fail) and exits non-zero on failure.
"""
import base64
import json
import os
import pathlib
import shutil
import struct
import subprocess
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pyarrow.flight as flight

REPO = pathlib.Path(__file__).resolve().parent.parent
SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/testdata/sf0.001"

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def start_server(ctl_dir):
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    cmd = ["java"] + [a for p in ADD_OPENS for a in ("--add-opens", f"{p}=ALL-UNNAMED")] + [
        "-Xmx4g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.tools.FlightInteropServer", SF_DIR, ctl_dir]
    log = open(os.path.join(ctl_dir, "server.log"), "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=log)
    ready = pathlib.Path(ctl_dir, "ready.json")
    deadline = time.time() + 300
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"server died rc={proc.returncode}; see {ctl_dir}/server.log")
        if ready.exists():
            return proc, json.loads(ready.read_text())
        time.sleep(0.5)
    raise RuntimeError("server did not become ready in 300s")


# ---------------------------------------------------------------- helpers
def cypher_message(cypher, database="graft", params=None):
    """The reference's CypherMessage wire shape: !H-prefixed utf8 fields
    (cypher, database, params-json) — CypherMessage.java:84-113."""
    c = cypher.encode("utf8")
    d = database.encode("utf8")
    p = json.dumps(params or {}).encode("utf8")
    return struct.pack(f"!H{len(c)}sH{len(d)}sH{len(p)}s",
                       len(c), c, len(d), d, len(p), p)


def submit(client, options, atype, body):
    """do_action -> serialized-Ticket result (reference `_submit`)."""
    res = list(client.do_action(flight.Action(atype, body), options))
    return flight.Ticket.deserialize(res[0].body.to_pybytes())


def job_status(client, options, ticket):
    res = list(client.do_action(
        flight.Action("job.status", ticket.serialize()), options))
    return res[0].body.to_pybytes().decode("utf8")


def wait_for_job(client, options, ticket, want=("PRODUCING", "COMPLETE"),
                 timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        st = job_status(client, options, ticket)
        if st in want:
            return st
        if st == "ERROR":
            raise RuntimeError("job reached ERROR")
        time.sleep(0.2)
    raise RuntimeError(f"job did not reach {want} in {timeout}s")


def read_flight(client, options, info):
    """Faithful consumer: the endpoint SET is the table."""
    tables = [client.do_get(ep.ticket, options).read_all()
              for ep in info.endpoints]
    return pa.concat_tables(tables)


def sorted_rows(table, keys):
    t = table.sort_by([(k, "ascending") for k in keys])
    return list(zip(*[t.column(c).to_pylist() for c in t.column_names]))


def assert_tables_equal(got, want, keys, step):
    g = sorted_rows(got.select(want.column_names), keys)
    w = sorted_rows(want, keys)
    assert g == w, f"{step}: table mismatch ({len(g)} vs {len(w)} rows)"


# ---------------------------------------------------------------- battery
def run_battery(results, client, options, ready, nation_pq, orders_pq):
    def step(name, fn):
        fn()
        results[name] = "pass"
        print(f"  ok {name}")

    # -- catalog
    def s_list_flights():
        infos = list(client.list_flights(None, options))
        names = {tuple(i.descriptor.path) for i in infos}
        assert (b"nation",) in names and (b"orders",) in names, names
        for i in infos:
            assert i.schema.names, "FlightInfo carried no parsable schema"
    step("list_flights", s_list_flights)

    def s_get_flight_info():
        info = client.get_flight_info(
            flight.FlightDescriptor.for_path("nation"), options)
        assert len(info.endpoints) == 2, \
            f"expected one endpoint per partition, got {len(info.endpoints)}"
        assert info.schema.names == ["n_nationkey", "n_regionkey", "n_name"]
    step("get_flight_info", s_get_flight_info)

    def s_get_schema():
        schema = client.get_schema(
            flight.FlightDescriptor.for_path("orders"), options).schema
        assert schema.names == ["o_orderkey", "o_custkey", "o_totalprice",
                                "o_orderstatus"], schema.names
    step("get_schema", s_get_schema)

    # -- data plane: do_get every endpoint, byte-faithful vs the parquet
    def s_do_get_nation():
        info = client.get_flight_info(
            flight.FlightDescriptor.for_path("nation"), options)
        got = read_flight(client, options, info)
        want = nation_pq
        assert got.num_rows == ready["nationRows"]
        assert_tables_equal(got, want, ["n_nationkey"], "do_get_nation")
    step("do_get_nation", s_do_get_nation)

    def s_do_get_orders():
        info = client.get_flight_info(
            flight.FlightDescriptor.for_path("orders"), options)
        got = read_flight(client, options, info)
        assert_tables_equal(got, orders_pq, ["o_orderkey"], "do_get_orders")
    step("do_get_orders", s_do_get_orders)

    # -- upload: do_put a table, read it back
    def s_do_put_roundtrip():
        t = pa.table({
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([1.5, 2.5, None, 4.5, 5.5], pa.float64()),
            "s": pa.array(["a", "b", "c", None, "e"], pa.string()),
        })
        desc = flight.FlightDescriptor.for_path("py_put")
        writer, reader = client.do_put(desc, t.schema, options)
        writer.write_table(t, max_chunksize=2)
        writer.done_writing()
        ack = reader.read()  # PutResult.app_metadata = row count
        assert ack.to_pybytes() == b"5", ack.to_pybytes()
        writer.close()
        info = client.get_flight_info(desc, options)
        got = read_flight(client, options, info)
        assert_tables_equal(got, t, ["k"], "do_put_roundtrip")
    step("do_put_roundtrip", s_do_put_roundtrip)

    # -- a LARGE upload (past the server's 4 MB spill threshold): the
    # ingest must take the disk-spill route and still serve back exactly
    def s_do_put_large_spill():
        n = 120000
        t = pa.table({
            "k": pa.array(range(n), pa.int64()),
            "pad": pa.array([f"{i:064d}" for i in range(n)], pa.string()),
        })
        desc = flight.FlightDescriptor.for_path("py_big")
        writer, reader = client.do_put(desc, t.schema, options)
        writer.write_table(t, max_chunksize=4096)
        writer.done_writing()
        assert reader.read().to_pybytes() == str(n).encode()
        writer.close()
        info = client.get_flight_info(desc, options)
        got = read_flight(client, options, info)
        assert got.num_rows == n
        assert pc.sum(got.column("k")).as_py() == n * (n - 1) // 2
        assert pc.sum(pc.utf8_length(got.column("pad"))).as_py() == n * 64
    step("do_put_large_spill", s_do_put_large_spill)

    # -- actions
    def s_list_actions():
        kinds = {a.type for a in client.list_actions(options)}
        assert {"cypher.read", "gds.read", "job.status", "job.cancel",
                "gds.write.nodes", "gds.write.relationships"} <= kinds, kinds
    step("list_actions", s_list_actions)

    def s_info_version():
        res = list(client.do_action(
            flight.Action("info.version", b""), options))
        obj = json.loads(res[0].body.to_pybytes())
        assert isinstance(obj, dict) and obj.get("serverName") == "graft"
    step("info_version", s_info_version)

    # -- the reference's query lifecycle: cypher.read -> poll -> do_get
    def s_cypher_read_flow():
        ticket = submit(client, options, "cypher.read", cypher_message(
            "SELECT o_orderstatus AS status, count(*) AS n, "
            "sum(o_custkey) AS sum_cust FROM orders GROUP BY 1"))
        wait_for_job(client, options, ticket)
        got = client.do_get(ticket, options).read_all()
        grouped = orders_pq.group_by("o_orderstatus").aggregate(
            [("o_orderkey", "count"), ("o_custkey", "sum")])
        want = pa.table({
            "status": grouped.column("o_orderstatus"),
            "n": grouped.column("o_orderkey_count").cast(pa.int64()),
            "sum_cust": grouped.column("o_custkey_sum"),
        })
        assert_tables_equal(got, want, ["status"], "cypher_read_flow")
        assert job_status(client, options, ticket) in ("PRODUCING",
                                                       "COMPLETE")
    step("cypher_read_flow", s_cypher_read_flow)

    # -- descriptor-as-command: GetFlightInfo(CMD=CypherMessage)
    def s_cmd_descriptor():
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(cypher_message(
                "SELECT count(*) AS n FROM nation")), options)
        got = read_flight(client, options, info)
        assert got.column("n").to_pylist() == [ready["nationRows"]]
    step("cmd_descriptor", s_cmd_descriptor)

    # -- the reference's graph write flow: gds.write.* action tickets the
    # message; DoPut rides FlightDescriptor.for_command(ticket.serialize())
    def s_gds_write_read_flow():
        nodes = pa.table({
            "ID": pa.array([10, 11, 12, 13], pa.int64()),
            "LABELS": pa.array([["A"], ["A", "B"], ["B"], ["A"]],
                               pa.list_(pa.string())),
            "age": pa.array([30, 40, 50, 60], pa.int64()),
        })
        rels = pa.table({
            "START_ID": pa.array([10, 11, 12], pa.int64()),
            "END_ID": pa.array([11, 12, 13], pa.int64()),
            "TYPE": pa.array(["KNOWS", "KNOWS", "LIKES"], pa.string()),
            "weight": pa.array([1.0, 2.0, 3.0], pa.float64()),
        })
        wt = submit(client, options, "gds.write.nodes", json.dumps({
            "db": "graft", "graph": "pygraph",
            "id_field": "ID", "labels_field": "LABELS"}).encode())
        w, r = client.do_put(
            flight.FlightDescriptor.for_command(wt.serialize()),
            nodes.schema, options)
        w.write_table(nodes)
        w.done_writing()
        assert r.read().to_pybytes() == b"4"
        w.close()
        wt2 = submit(client, options, "gds.write.relationships", json.dumps({
            "db": "graft", "graph": "pygraph", "source_field": "START_ID",
            "target_field": "END_ID", "type_field": "TYPE"}).encode())
        w, r = client.do_put(
            flight.FlightDescriptor.for_command(wt2.serialize()),
            rels.schema, options)
        w.write_table(rels)
        w.done_writing()
        assert r.read().to_pybytes() == b"3"
        w.close()
        # read the graph back through gds.read (node + relationship)
        nt = submit(client, options, "gds.read", json.dumps({
            "db": "graft", "graph": "pygraph", "type": "node",
            "node_id": "", "properties": ["age"], "filters": []}).encode())
        wait_for_job(client, options, nt)
        got_nodes = client.do_get(nt, options).read_all()
        assert sorted(got_nodes.column("ID").to_pylist()) == [10, 11, 12, 13]
        by_id = dict(zip(got_nodes.column("ID").to_pylist(),
                         got_nodes.column("age").to_pylist()))
        assert by_id == {10: 30, 11: 40, 12: 50, 13: 60}
        rt = submit(client, options, "gds.read", json.dumps({
            "db": "graft", "graph": "pygraph", "type": "relationship",
            "node_id": "", "properties": ["weight"],
            "filters": ["KNOWS"]}).encode())
        wait_for_job(client, options, rt)
        got_rels = client.do_get(rt, options).read_all()
        pairs = sorted(zip(got_rels.column("START_ID").to_pylist(),
                           got_rels.column("END_ID").to_pylist(),
                           got_rels.column("value").to_pylist()))
        assert pairs == [(10, 11, 1.0), (11, 12, 2.0)], pairs
    step("gds_write_read_flow", s_gds_write_read_flow)

    # -- do_exchange: rows up under a CMD CypherMessage, transform back
    def s_do_exchange():
        t = pa.table({"x": pa.array([1, 2, 3, 4], pa.int64())})
        desc = flight.FlightDescriptor.for_command(cypher_message(
            "SELECT sum(x) AS sx, count(*) AS n FROM input"))
        writer, reader = client.do_exchange(desc, options)
        writer.begin(t.schema)
        writer.write_table(t)
        writer.done_writing()
        got = reader.read_all()
        assert got.column("sx").to_pylist() == [10]
        assert got.column("n").to_pylist() == [4]
        writer.close()
    step("do_exchange", s_do_exchange)

    # -- error surface: unknown job ticket must map to a KeyError-class
    # gRPC status (the reference client's wait loop catches ArrowKeyError)
    def s_not_found():
        try:
            job_status(client, options,
                       flight.Ticket(b"no-such-ticket"))
            raise AssertionError("job.status of unknown ticket succeeded")
        except pa.lib.ArrowKeyError:
            pass
        try:
            client.do_get(flight.Ticket(b"no-such-flight"),
                          options).read_all()
            raise AssertionError("do_get of unknown flight succeeded")
        except pa.lib.ArrowKeyError:
            pass
    step("not_found_maps_to_key_error", s_not_found)


# ---------------------------------------------------------------- soak
def server_stat(ctl_dir, seq):
    """Ask the server for {aborted, spillDirs} via the ctl-dir stat
    protocol; the echoed seq guards against reading a stale answer.
    The request is written atomically (tmp + rename) — the server's
    poll does read-then-delete, so a write_text could be consumed
    half-written."""
    tmp = pathlib.Path(ctl_dir, ".stat_req.tmp")
    tmp.write_text(str(seq))
    os.replace(tmp, pathlib.Path(ctl_dir, "stat_req"))
    p = pathlib.Path(ctl_dir, "stat.json")
    deadline = time.time() + 15
    while time.time() < deadline:
        if p.exists():
            try:
                s = json.loads(p.read_text())
                if s.get("seq") == str(seq):
                    return s
            except (json.JSONDecodeError, OSError):
                pass
        time.sleep(0.1)
    raise RuntimeError("server stat timed out")


def rss_kb(pid):
    for line in open(f"/proc/{pid}/status"):
        if line.startswith("VmRSS:"):
            return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def run_soak(results, ready, ctl_dir, server_pid):
    url = f"grpc+tcp://127.0.0.1:{ready['port']}"
    token = ready["token"]
    seq = [0]

    def stat():
        seq[0] += 1
        return server_stat(ctl_dir, seq[0])

    def authed_client():
        c = flight.FlightClient(url)
        pair = c.authenticate_basic_token("anyuser", token)
        return c, flight.FlightCallOptions(headers=[pair])

    # (a) 8 concurrent clients mixing DoGet (incl. the 2M-row bulk
    # flight), spill-crossing DoPut, and actions against ONE server with
    # a capped heap (-Xmx4g): everything completes, RSS stays bounded —
    # the head-of-line / memory claims under real concurrency.
    def s_concurrent_soak():
        import concurrent.futures as cf

        def worker(i):
            c, opt = authed_client()
            try:
                for it in range(2):
                    info = c.get_flight_info(
                        flight.FlightDescriptor.for_path("orders"), opt)
                    t = read_flight(c, opt, info)
                    assert t.num_rows == ready["ordersRows"]
                    if i % 2 == 0:
                        binfo = c.get_flight_info(
                            flight.FlightDescriptor.for_path("bulk"), opt)
                        bt = read_flight(c, opt, binfo)
                        assert bt.num_rows == 2000000, bt.num_rows
                    n = 20000
                    up = pa.table({
                        "k": pa.array(range(n), pa.int64()),
                        "pad": pa.array([f"{j:0256d}" for j in range(n)],
                                        pa.string()),
                    })
                    w, r = c.do_put(
                        flight.FlightDescriptor.for_path(f"soak_{i}_{it}"),
                        up.schema, opt)
                    w.write_table(up, max_chunksize=2048)
                    w.done_writing()
                    assert r.read().to_pybytes() == str(n).encode()
                    w.close()
                    list(c.do_action(flight.Action("info.version", b""),
                                     opt))
            finally:
                c.close()

        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            futs = [ex.submit(worker, i) for i in range(8)]
            for f in cf.as_completed(futs, timeout=600):
                f.result()
        rss = rss_kb(server_pid)
        # heap is capped at 4g; 6 GiB RSS allows metaspace + native Netty
        # buffers while still catching an O(dataset) regression (the bulk
        # flight alone is ~1.9 GiB × 8 readers if ever materialized)
        assert rss < 6 * 1024 * 1024, f"server RSS {rss} kB unbounded"

    # (b) cancel after 2 batches of the 2M-row DoGet: the server must
    # abort the producer (observable: abortedResponses), and another
    # in-flight full read of the SAME flight must still finish whole.
    def s_cancel_mid_stream():
        import threading as th
        before = stat()["aborted"]
        full_rows = []

        def full_read():
            c2, opt2 = authed_client()
            try:
                info2 = c2.get_flight_info(
                    flight.FlightDescriptor.for_path("bulk"), opt2)
                full_rows.append(read_flight(c2, opt2, info2).num_rows)
            finally:
                c2.close()

        t = th.Thread(target=full_read)
        t.start()
        c, opt = authed_client()
        info = c.get_flight_info(
            flight.FlightDescriptor.for_path("bulk"), opt)
        reader = c.do_get(info.endpoints[0].ticket, opt)
        reader.read_chunk()
        reader.read_chunk()
        reader.cancel()
        c.close()
        deadline = time.time() + 60
        aborted = before
        while time.time() < deadline and aborted <= before:
            time.sleep(0.5)
            aborted = stat()["aborted"]
        assert aborted > before, \
            f"producer never aborted (count {aborted} <= {before})"
        t.join(timeout=300)
        assert full_rows == [2000000], \
            f"concurrent full read broken by the cancel: {full_rows}"

    # (c) abandon a spill-crossing DoPut mid-upload: the server must
    # reclaim the spill directory. NB a graceful client close() after
    # write_table HALF-CLOSES the stream (pyarrow sends END_STREAM), so
    # the server rightly treats that as a complete upload and registers
    # the flight — to genuinely abandon, the uploader runs in a child
    # process that is SIGKILLed mid-stream, so the connection dies with
    # no END_STREAM and the server's channelInactive→abort path must
    # fire and delete the spill files.
    def s_abandoned_put_reclaims_spill():
        before = stat()["spillDirs"]
        uploader = f"""
import time
import pyarrow as pa, pyarrow.flight as flight
c = flight.FlightClient({url!r})
pair = c.authenticate_basic_token("anyuser", {token!r})
opt = flight.FlightCallOptions(headers=[pair])
n = 60000
up = pa.table({{"k": pa.array(range(n), pa.int64()),
               "pad": pa.array([f"{{j:0128d}}" for j in range(n)],
                               pa.string())}})
w, _ = c.do_put(flight.FlightDescriptor.for_path("abandoned"),
                up.schema, opt)
w.write_table(up, max_chunksize=2048)  # ~8 MB: past the spill threshold
print("WRITTEN", flush=True)
time.sleep(600)  # never done_writing — parent SIGKILLs us here
"""
        proc = subprocess.Popen([sys.executable, "-c", uploader],
                                stdout=subprocess.PIPE, text=True)
        try:
            # wait until the upload crossed the spill threshold server-side
            assert proc.stdout.readline().strip() == "WRITTEN"
            deadline = time.time() + 60
            while time.time() < deadline and stat()["spillDirs"] <= before:
                time.sleep(0.2)
            grew = stat()["spillDirs"]
            assert grew > before, f"upload never spilled ({grew})"
        finally:
            proc.kill()  # TCP dies with the process: no END_STREAM
            proc.wait()
        deadline = time.time() + 60
        dirs = None
        while time.time() < deadline:
            dirs = stat()["spillDirs"]
            if dirs <= before:
                break
            time.sleep(0.5)
        assert dirs is not None and dirs <= before, \
            f"spill dirs leaked: {before} -> {dirs}"

    for name, fn in [("concurrent_soak_8_clients", s_concurrent_soak),
                     ("cancel_mid_stream_aborts_producer",
                      s_cancel_mid_stream),
                     ("abandoned_put_reclaims_spill",
                      s_abandoned_put_reclaims_spill)]:
        fn()
        results[name] = "pass"
        print(f"  ok {name}")


class SecretAuthHandler(flight.ClientAuthHandler):
    """The LEGACY Flight auth flow: handshake payload carries the secret,
    the response payload is the bearer, later calls ride auth-token-bin."""

    def __init__(self, secret):
        super().__init__()
        self.secret = secret
        self.token = b""

    def authenticate(self, outgoing, incoming):
        outgoing.write(self.secret.encode())
        self.token = incoming.read()

    def get_token(self):
        return self.token


def main():
    results = {}
    ctl_dir = tempfile.mkdtemp(prefix="flight_interop_")
    proc = None
    ok = False
    try:
        print(f"[interop] starting server (sf={SF_DIR}) ...")
        proc, ready = start_server(ctl_dir)
        print(f"[interop] ready: h2c={ready['port']} tls={ready['tlsPort']}")
        token = ready["token"]

        nation_pq = pq.read_table(
            os.path.join(SF_DIR, "nation.parquet"),
            columns=["n_nationkey", "n_regionkey", "n_name"])
        orders_pq = pq.read_table(
            os.path.join(SF_DIR, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderstatus"])

        # ---- h2c + AuthenticateBasicToken (header-based auth): the
        # server must hand the bearer back in Handshake response metadata
        client = flight.FlightClient(f"grpc+tcp://127.0.0.1:{ready['port']}")
        pair = client.authenticate_basic_token("anyuser", token)
        assert pair[0] == b"authorization" and \
            pair[1] == f"Bearer {token}".encode(), pair
        results["authenticate_basic_token"] = "pass"
        print("  ok authenticate_basic_token")
        options = flight.FlightCallOptions(headers=[pair])
        run_battery(results, client, options, ready, nation_pq, orders_pq)

        # ---- the reference client's exact credential shape: Basic header
        # on EVERY call, no prior handshake (neo4j_arrow.py:112-118)
        basic = base64.b64encode(f"anyuser:{token}".encode())
        basic_opts = flight.FlightCallOptions(
            headers=[(b"authorization", b"Basic " + basic)])
        n = len(list(client.list_flights(None, basic_opts)))
        assert n >= 2
        results["basic_header_per_call"] = "pass"
        print("  ok basic_header_per_call")

        # ---- legacy handshake auth (payload secret -> auth-token-bin)
        client2 = flight.FlightClient(f"grpc+tcp://127.0.0.1:{ready['port']}")
        handler = SecretAuthHandler(token)
        client2.authenticate(handler)
        assert handler.token == token.encode(), handler.token
        assert len(list(client2.list_flights())) >= 2
        results["legacy_handshake_auth"] = "pass"
        print("  ok legacy_handshake_auth")
        client2.close()

        # ---- auth negatives
        try:
            flight.FlightClient(
                f"grpc+tcp://127.0.0.1:{ready['port']}"
            ).authenticate_basic_token("u", "wrong-secret")
            raise AssertionError("bad secret authenticated")
        except flight.FlightUnauthenticatedError:
            pass
        try:
            list(client.list_flights(None, flight.FlightCallOptions(
                headers=[(b"authorization", b"Bearer nope")])))
            raise AssertionError("bad bearer authorized")
        except flight.FlightUnauthenticatedError:
            pass
        results["auth_negatives"] = "pass"
        print("  ok auth_negatives")

        # ---- TLS listener: pinned server cert, ALPN h2, full verb reuse
        cert = pathlib.Path(ready["certPem"]).read_bytes()
        tls_client = flight.FlightClient(
            f"grpc+tls://127.0.0.1:{ready['tlsPort']}", tls_root_certs=cert)
        pair_tls = tls_client.authenticate_basic_token("anyuser", token)
        tls_opts = flight.FlightCallOptions(headers=[pair_tls])
        info = tls_client.get_flight_info(
            flight.FlightDescriptor.for_path("nation"), tls_opts)
        got = read_flight(tls_client, tls_opts, info)
        assert_tables_equal(got, nation_pq, ["n_nationkey"], "tls_do_get")
        results["tls_do_get"] = "pass"
        print("  ok tls_do_get")
        tls_client.close()
        client.close()

        # ---- soak: concurrency, cancel-mid-stream, abandoned-put reclaim
        run_soak(results, ready, ctl_dir, proc.pid)
        ok = True
    except Exception as e:  # noqa: BLE001 — report, then fail the run
        results["FAILED"] = f"{type(e).__name__}: {e}"
        import traceback
        traceback.print_exc()
    finally:
        pathlib.Path(ctl_dir, "stop").touch()
        if proc is not None:
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
        out = {
            "pyarrow": pa.__version__,
            "sfDir": SF_DIR,
            "steps": results,
            "ok": ok,
        }
        pathlib.Path(REPO, "INTEROP.json").write_text(
            json.dumps(out, indent=2) + "\n")
        print(json.dumps(out))
        if "--keep-server" not in sys.argv:
            shutil.rmtree(ctl_dir, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
