"""Minimal in-process MQTT 3.1.1 broker — TEST INFRASTRUCTURE ONLY.

A real TCP broker (loopback sockets, framed packets, threaded
sessions), not a mock: CONNECT/CONNACK, SUBSCRIBE/SUBACK with
'+'/'#' filter matching, QoS-0 PUBLISH fan-out, PINGREQ/PINGRESP,
DISCONNECT. Enough broker for tests/test_mqtt.py to drive the
product client/bridge end-to-end; deliberately NOT shipped in the
package (a broker is the infrastructure the engine talks to, not an
engine feature)."""

from __future__ import annotations

import socket
import threading

from lambda_sample_spark.streaming.mqtt import (
    CONNECT,
    DISCONNECT,
    PINGREQ,
    PINGRESP,
    PUBLISH,
    SUBSCRIBE,
    decode_publish,
    encode_connack,
    encode_publish,
    encode_simple,
    encode_suback,
    read_packet,
    topic_matches,
)


class MiniBroker:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()
        self._lock = threading.Lock()
        # conn -> list of topic filters
        self._subs: dict[socket.socket, list[str]] = {}
        self._stop = threading.Event()
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)
        self._accept_thread.start()

    def _accept(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket):
        try:
            ptype, _, _body = read_packet(conn)
            if ptype != CONNECT:
                conn.close()
                return
            conn.sendall(encode_connack())
            with self._lock:
                self._subs[conn] = []
            while not self._stop.is_set():
                try:
                    ptype, _, body = read_packet(conn)
                except (EOFError, ConnectionError, OSError):
                    break
                if ptype == SUBSCRIBE:
                    pid = int.from_bytes(body[:2], "big")
                    ln = int.from_bytes(body[2:4], "big")
                    filt = body[4 : 4 + ln].decode("utf-8")
                    with self._lock:
                        self._subs[conn].append(filt)
                    conn.sendall(encode_suback(pid))
                elif ptype == PUBLISH:
                    topic, payload = decode_publish(body)
                    pkt = encode_publish(topic, payload)
                    with self._lock:
                        targets = [
                            c
                            for c, filts in self._subs.items()
                            if c is not conn
                            and any(topic_matches(f, topic) for f in filts)
                        ]
                    for c in targets:
                        try:
                            c.sendall(pkt)
                        except OSError:
                            pass
                elif ptype == PINGREQ:
                    conn.sendall(encode_simple(PINGRESP))
                elif ptype == DISCONNECT:
                    break
        finally:
            with self._lock:
                self._subs.pop(conn, None)
            conn.close()

    def stop(self):
        self._stop.set()
        self._srv.close()
        with self._lock:
            for c in list(self._subs):
                # shutdown BEFORE close: close() alone only drops the
                # fd refcount while a _serve thread is blocked in recv
                # on it — no FIN goes out and peers never notice the
                # broker died; shutdown() tears the connection down
                # immediately and wakes the blocked thread
                try:
                    c.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                c.close()
