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
        """Yield (topic, payload) until the connection closes. An idle
        receive window is NOT a close: the socket timeout doubles as
        the keepalive clock — each quiet interval sends PINGREQ (the
        spec obligation a receive-only subscriber otherwise never
        meets, and a compliant broker drops silent clients at 1.5x the
        advertised keepalive); only EOF / broken pipe terminate."""
        self.sock.settimeout(max(self.keepalive / 2.0, 1.0))
        while True:
            try:
                first = self.sock.recv(1)
            except TimeoutError:
                # idle between frames: this is the keepalive clock
                try:
                    self.sock.sendall(encode_simple(PINGREQ))
                except OSError:
                    return
                continue
            except OSError:
                return
            try:
                ptype, _, body = read_packet(self.sock, first=first)
            except (EOFError, ConnectionError, OSError):
                # includes a timeout MID-frame: that is a stalled peer,
                # not idleness — resynchronizing is impossible, so close
                return
            if ptype == PUBLISH:
                yield decode_publish(body)
            elif ptype == PINGREQ:
                self.sock.sendall(encode_simple(PINGRESP))

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
    sees a partial file. Runs on a daemon thread; ``stop()`` flushes."""

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
        self.client = MqttClient(host, port, client_id=f"bridge-{uuid.uuid4().hex[:8]}")
        self.client.subscribe(topic)
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._roller = threading.Thread(target=self._roll_loop, daemon=True)
        self._reader.start()
        self._roller.start()

    def _read_loop(self):
        for _topic, payload in self.client.messages():
            with self._lock:
                self._buf.append(payload)
                full = len(self._buf) >= self.max_buffer
            if full:
                self.flush()
            if self._stop.is_set():
                return

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
        tmp = os.path.join(self.out_dir, f".batch-{seq:08d}.json.tmp")
        final = os.path.join(self.out_dir, f"batch-{seq:08d}.json")
        with open(tmp, "wb") as f:
            for payload in batch:
                f.write(payload.rstrip(b"\n") + b"\n")
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
    directory, decoded to the wire schema + ingest timestamp (the
    same downstream contract as pipeline.sensor_stream)."""
    from pyspark.sql import functions as F

    raw = spark.readStream.schema(WIRE_SCHEMA).json(bridge_dir)
    return raw.withColumn("ts", F.current_timestamp())


def publish_stream(df, host: str, port: int, topic: str, checkpoint: str):
    """The outbound leg: foreachBatch publisher — each row one QoS-0
    JSON message (Producer.scala's MqttEntry shape). One client per
    micro-batch per partition; rows travel as canonical JSON built
    JVM-side (to_json), Python only moves bytes."""
    from pyspark.sql import functions as F

    def send(batch_df, _epoch):
        rows = batch_df.select(
            F.to_json(F.struct(*batch_df.columns)).alias("j")
        ).collect()
        cli = MqttClient(host, port)
        try:
            for r in rows:
                cli.publish(topic, r["j"].encode())
        finally:
            cli.disconnect()

    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(send)
    )
