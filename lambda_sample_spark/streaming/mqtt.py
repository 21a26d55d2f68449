"""Native MQTT connectivity (SURVEY.md §2.1 S2/S3 — the reference's
actual broker protocol: mqtt/Producer.scala:72-73 publishes and
mqtt/Consumer.scala:32-45 subscribes over MQTT with JSON payloads).

Spark has no first-party MQTT DSv2, and this engine previously
expressed the broker leg as the flag-gated Kafka twin (kafka.py) plus
a rate-source stand-in — fixture-proven but never driven against a
real broker. This module closes that seam with the MQTT 3.1.1 WIRE
PROTOCOL itself, pure stdlib (the packet grammar is the public OASIS
standard): varint remaining-length framing, CONNECT/CONNACK,
QoS-0 PUBLISH, SUBSCRIBE/SUBACK, PING, DISCONNECT — everything the
reference's QoS-0 JSON leg uses. tests/test_mqtt.py drives it against
a real in-process TCP broker (loopback sockets, not mocks): codec
golden bytes, publish/subscribe round-trips, and the full
broker -> bridge -> Structured Streaming -> parquet path.

Spark integration is the bridge pattern (the standard answer for
sources Spark lacks a connector for):

  - inbound: ``MqttFileBridge`` subscribes and appends JSON-lines
    micro-batch files that ``mqtt_stream`` tails as a file-stream
    source — at-least-once, offset-tracked by the file-stream log,
    decode via ``from_json`` (JVM-side, same WIRE_SCHEMA as the Kafka
    twin).
  - outbound: ``publish_stream`` is a foreachBatch sink publishing
    each row as a JSON QoS-0 message (Producer.scala's shape).

Scale notes: one bridge per topic partition (MQTT shared
subscriptions, ``$share/<group>/<topic>``, fan out a topic across
bridges); the file-stream side then scales like any directory source.
QoS 0 mirrors the reference (fire-and-forget actor publish); the
bridge's append-then-rename keeps files atomic for the tailing reader.
"""

from __future__ import annotations

import os
import socket
import threading
import uuid

# --- packet codec (MQTT 3.1.1, OASIS spec §2-3) ------------------------

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def encode_varint(n: int) -> bytes:
    """Remaining-length varint: 7 bits per byte, continuation high
    bit, least-significant group first, max 4 bytes (spec §2.2.3)."""
    if n < 0 or n > 268_435_455:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        n, digit = divmod(n, 128)
        out.append(digit | (0x80 if n else 0))
        if not n:
            return bytes(out)


def decode_varint(buf: bytes, off: int = 0) -> tuple[int, int]:
    """-> (value, bytes consumed starting at off)."""
    mult, val, i = 1, 0, off
    while True:
        if i >= len(buf) or i - off >= 4:
            raise ValueError("malformed remaining length")
        b = buf[i]
        val += (b & 0x7F) * mult
        mult *= 128
        i += 1
        if not b & 0x80:
            return val, i - off


def _utf(s: str) -> bytes:
    b = s.encode("utf-8")
    return len(b).to_bytes(2, "big") + b


def _read_utf(body: bytes, off: int) -> tuple[str, int]:
    ln = int.from_bytes(body[off : off + 2], "big")
    return body[off + 2 : off + 2 + ln].decode("utf-8"), off + 2 + ln


def encode_connect(client_id: str, keepalive: int = 60, clean: bool = True) -> bytes:
    vh = _utf("MQTT") + bytes([4, 0x02 if clean else 0x00]) + keepalive.to_bytes(2, "big")
    body = vh + _utf(client_id)
    return bytes([CONNECT << 4]) + encode_varint(len(body)) + body


def encode_connack(session_present: bool = False, rc: int = 0) -> bytes:
    return bytes([CONNACK << 4, 2, 1 if session_present else 0, rc])


def encode_publish(topic: str, payload: bytes) -> bytes:
    body = _utf(topic) + payload  # QoS 0: no packet identifier
    return bytes([PUBLISH << 4]) + encode_varint(len(body)) + body


def decode_publish(body: bytes) -> tuple[str, bytes]:
    topic, off = _read_utf(body, 0)
    return topic, body[off:]


def encode_subscribe(packet_id: int, topic_filter: str, qos: int = 0) -> bytes:
    body = packet_id.to_bytes(2, "big") + _utf(topic_filter) + bytes([qos])
    # SUBSCRIBE requires fixed-header flags 0b0010 (spec §3.8.1)
    return bytes([(SUBSCRIBE << 4) | 0x02]) + encode_varint(len(body)) + body


def encode_suback(packet_id: int, rc: int = 0) -> bytes:
    return bytes([SUBACK << 4, 3]) + packet_id.to_bytes(2, "big") + bytes([rc])


def encode_simple(ptype: int) -> bytes:
    return bytes([ptype << 4, 0])


def read_packet(
    sock: socket.socket, first: bytes | None = None
) -> tuple[int, int, bytes]:
    """Read one framed packet -> (type, flags, body). Raises
    ConnectionError on EOF mid-frame, EOFError on clean close.
    ``first`` injects an already-read header byte (the idle-timeout
    loop reads it separately so a timeout can only ever fire BETWEEN
    frames, never desync mid-frame)."""
    if first is None:
        first = sock.recv(1)
    if not first:
        raise EOFError("connection closed")
    ptype, flags = first[0] >> 4, first[0] & 0x0F
    # varint: read byte-at-a-time until the continuation bit clears
    raw = bytearray()
    while True:
        b = sock.recv(1)
        if not b:
            raise ConnectionError("EOF in remaining length")
        raw += b
        if not b[0] & 0x80:
            break
        if len(raw) >= 4:
            raise ValueError("malformed remaining length")
    length, _ = decode_varint(bytes(raw))
    body = b""
    while len(body) < length:
        chunk = sock.recv(length - len(body))
        if not chunk:
            raise ConnectionError("EOF in packet body")
        body += chunk
    return ptype, flags, body


def valid_filter(filt: str) -> bool:
    """Spec §4.7.1: '#' only as the LAST level; '+'/'#' must occupy a
    whole level."""
    parts = filt.split("/")
    for i, p in enumerate(parts):
        if "#" in p and (p != "#" or i != len(parts) - 1):
            return False
        if "+" in p and p != "+":
            return False
    return True


def topic_matches(filt: str, topic: str) -> bool:
    """MQTT topic-filter match: '+' one level, '#' trailing multi-level
    (spec §4.7). Malformed filters (e.g. non-final '#') match nothing
    rather than silently over-matching."""
    if not valid_filter(filt):
        return False
    fparts, tparts = filt.split("/"), topic.split("/")
    for i, f in enumerate(fparts):
        if f == "#":
            return True
        if i >= len(tparts):
            return False
        if f != "+" and f != tparts[i]:
            return False
    return len(fparts) == len(tparts)


# --- client ------------------------------------------------------------


class MqttClient:
    """Minimal blocking QoS-0 client: connect, publish, subscribe,
    iterate messages. The shapes Consumer.scala/Producer.scala use —
    no QoS>0 state machine, no retained messages, no wills."""

    def __init__(self, host: str, port: int, client_id: str | None = None,
                 timeout: float = 10.0, keepalive: int = 60):
        self.keepalive = keepalive
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.sendall(
            encode_connect(
                client_id or f"lss-{uuid.uuid4().hex[:8]}", keepalive=keepalive
            )
        )
        ptype, _, body = read_packet(self.sock)
        if ptype != CONNACK or body[1] != 0:
            raise ConnectionError(f"CONNACK refused: type={ptype} body={body!r}")
        self._next_id = 1

    def publish(self, topic: str, payload: bytes) -> None:
        self.sock.sendall(encode_publish(topic, payload))

    def subscribe(self, topic_filter: str) -> None:
        if not valid_filter(topic_filter):
            raise ValueError(f"invalid MQTT topic filter: {topic_filter!r}")
        pid = self._next_id
        self._next_id = pid % 65535 + 1
        self.sock.sendall(encode_subscribe(pid, topic_filter))
        ptype, _, body = read_packet(self.sock)
        if ptype != SUBACK or int.from_bytes(body[:2], "big") != pid:
            raise ConnectionError(f"bad SUBACK: type={ptype} body={body!r}")

    def messages(self):
        """Yield (topic, payload) until the connection closes. The
        keepalive obligation (spec: the BROKER judges liveness by
        packets the CLIENT sends, dropping silent clients at 1.5x the
        advertised interval) is met on BOTH traffic shapes: an idle
        receive window times out and pings, and a busy inbound stream
        — where the timeout never fires — pings on a wall-clock check
        after each frame. Only EOF / broken pipe / a malformed frame
        terminate (resynchronizing a byte stream after a bad
        remaining-length or truncated frame is impossible)."""
        import time as _time

        interval = max(self.keepalive / 2.0, 1.0)
        self.sock.settimeout(interval)
        last_send = _time.monotonic()

        def ping() -> bool:
            nonlocal last_send
            try:
                self.sock.sendall(encode_simple(PINGREQ))
            except OSError:
                return False
            last_send = _time.monotonic()
            return True

        while True:
            try:
                first = self.sock.recv(1)
            except TimeoutError:
                # idle between frames: this is the keepalive clock
                if not ping():
                    return
                continue
            except OSError:
                return
            try:
                ptype, _, body = read_packet(self.sock, first=first)
                if ptype == PUBLISH:
                    yield decode_publish(body)
                elif ptype == PINGREQ:
                    self.sock.sendall(encode_simple(PINGRESP))
                    last_send = _time.monotonic()
            except (EOFError, ConnectionError, OSError,
                    ValueError, UnicodeDecodeError):
                # mid-frame timeout / EOF / malformed varint / bad
                # topic UTF-8: the stream cannot be resynchronized
                return
            if _time.monotonic() - last_send > interval and not ping():
                return

    def disconnect(self) -> None:
        try:
            self.sock.sendall(encode_simple(DISCONNECT))
        finally:
            self.sock.close()


# --- file bridge: MQTT -> Structured Streaming -------------------------

WIRE_SCHEMA = "sensor STRING, value DOUBLE, anomaly INT"  # kafka.py twin


class MqttFileBridge:
    """Subscribe to a topic and append micro-batch JSON-lines files a
    Spark file stream tails. Messages buffer for ``roll_secs`` (or
    ``max_buffer`` messages) then land atomically: write to a dot-
    prefixed temp name, fsync, rename — the file-stream reader never
    sees a partial file. Runs on a daemon thread; ``stop()`` flushes.

    Each landed line is an ENVELOPE ``{"ts_ms": <receive time>,
    "raw": <payload text>}``: the per-message receive timestamp is
    stamped HERE, at arrival, because a streaming-side
    current_timestamp() is frozen per micro-batch — every row of a
    batch would share one ts and the (sensor, ts)-keyed LWW upsert
    would collapse each batch to one row per sensor (the hazard
    pipeline.sensor_stream documents)."""

    def __init__(self, host: str, port: int, topic: str, out_dir: str,
                 roll_secs: float = 1.0, max_buffer: int = 1000):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.roll_secs = roll_secs
        self.max_buffer = max_buffer
        self._buf: list[bytes] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._seq = 0
        # terminal state of the INBOUND leg: the roller thread keeps
        # running after the message iterator dies (mid-frame timeout,
        # malformed frame, broker death), so without this flag a dead
        # bridge looks healthy while consuming nothing — owners and
        # tests poll `dead` / `error` to detect it
        self.dead = False
        self.error: BaseException | None = None
        self.client = MqttClient(host, port, client_id=f"bridge-{uuid.uuid4().hex[:8]}")
        self.client.subscribe(topic)
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._roller = threading.Thread(target=self._roll_loop, daemon=True)
        self._reader.start()
        self._roller.start()

    def _read_loop(self):
        import time as _time

        try:
            for _topic, payload in self.client.messages():
                entry = (int(_time.time() * 1000), payload)
                with self._lock:
                    self._buf.append(entry)
                    full = len(self._buf) >= self.max_buffer
                if full:
                    self.flush()
                if self._stop.is_set():
                    return
        except BaseException as exc:  # record, then surface via `dead`
            self.error = exc
            raise
        finally:
            # messages() returning at all (EOF, malformed frame,
            # broken pipe) means the inbound leg is gone for good —
            # a clean stop() is the one deliberate path
            self.dead = not self._stop.is_set()

    def _roll_loop(self):
        while not self._stop.wait(self.roll_secs):
            self.flush()

    def flush(self) -> int:
        with self._lock:
            batch, self._buf = self._buf, []
            if not batch:
                return 0
            seq = self._seq
            self._seq += 1
        import json as _json

        tmp = os.path.join(self.out_dir, f".batch-{seq:08d}.json.tmp")
        final = os.path.join(self.out_dir, f"batch-{seq:08d}.json")
        with open(tmp, "w", encoding="utf-8") as f:
            for ts_ms, payload in batch:
                line = _json.dumps(
                    {"ts_ms": ts_ms, "raw": payload.decode("utf-8", "replace")}
                )
                f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        return len(batch)

    def stop(self):
        self._stop.set()
        try:
            self.client.disconnect()
        except OSError:
            pass
        self.flush()


def mqtt_stream(spark, bridge_dir: str):
    """The inbound leg: a streaming frame over the bridge's landing
    directory, decoded to the wire schema + the bridge's PER-MESSAGE
    receive timestamp (ms-truncated — the same downstream contract as
    pipeline.sensor_stream, whose keyed LWW upsert needs distinct ts
    per reading; current_timestamp() here would be frozen per
    micro-batch and collapse each batch to one row per sensor)."""
    from pyspark.sql import functions as F

    env = spark.readStream.schema("ts_ms LONG, raw STRING").json(bridge_dir)
    return env.select(
        F.from_json("raw", WIRE_SCHEMA).alias("r"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    ).select("r.sensor", "r.value", "r.anomaly", "ts")


def publish_stream(df, host: str, port: int, topic: str, checkpoint: str):
    """The outbound leg: foreachBatch publisher — each row one QoS-0
    JSON message (Producer.scala's MqttEntry shape). Publishing runs
    EXECUTOR-SIDE via foreachPartition, one lazily-opened client per
    non-empty partition: the driver never collects the batch (a
    backlog replay would otherwise pull every row into driver memory)
    and partitions publish in parallel. Rows travel as canonical JSON
    built JVM-side (to_json); the partition closure is fully
    self-contained (inline CONNECT/PUBLISH byte builders — Spark's
    Python workers do not have this package on sys.path when the
    driver imports it from a file path, the multimodal closure
    rule)."""
    from pyspark.sql import functions as F

    host_, port_, topic_b = host, port, topic.encode("utf-8")

    def send(batch_df, _epoch):
        jdf = batch_df.select(F.to_json(F.struct(*batch_df.columns)).alias("j"))

        def pub(rows):
            import socket as _socket
            import uuid as _uuid

            def vint(n: int) -> bytes:
                out = bytearray()
                while True:
                    n, d = divmod(n, 128)
                    out.append(d | (0x80 if n else 0))
                    if not n:
                        return bytes(out)

            def utf(b: bytes) -> bytes:
                return len(b).to_bytes(2, "big") + b

            sock = None
            try:
                for r in rows:
                    if sock is None:  # lazy: empty partitions open nothing
                        cid = ("lss-sink-" + _uuid.uuid4().hex[:8]).encode()
                        vh = utf(b"MQTT") + bytes([4, 0x02]) + (60).to_bytes(2, "big")
                        body = vh + utf(cid)
                        sock = _socket.create_connection((host_, port_), timeout=10)
                        sock.sendall(bytes([0x10]) + vint(len(body)) + body)
                        ack = b""
                        while len(ack) < 4:
                            c = sock.recv(4 - len(ack))
                            if not c:
                                raise ConnectionError("no CONNACK")
                            ack += c
                        if ack[3] != 0:
                            raise ConnectionError(f"CONNACK refused rc={ack[3]}")
                    pbody = utf(topic_b) + r["j"].encode("utf-8")
                    sock.sendall(bytes([0x30]) + vint(len(pbody)) + pbody)
                if sock is not None:
                    sock.sendall(bytes([0xE0, 0]))  # DISCONNECT
            finally:
                if sock is not None:
                    sock.close()

        jdf.foreachPartition(pub)

    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(send)
    )
