"""Client/server mode.

Counterpart of the reference's IPC mode — prompt process ⇄ engine
process over shared memory (prompt.py:299-318, server.cpp:659-693).
TPU-natively the engine owns the device; remote clients talk to it over
a TCP line protocol instead of mmap'd flags:

    request:  4-byte big-endian length + UTF-8 SQL text
    response: 4-byte big-endian length + UTF-8 payload
              first byte 'R' (result table CSV), 'E' (error), 'N' (no rows)

Run a server:   python -m aquery2_tpu.repl.server [host [port]]
Connect:        client = AqClient("localhost", 6787); client.execute(sql)
"""

from __future__ import annotations

import socket
import struct
import threading

from aquery2_tpu.session import Session

_HDR = struct.Struct(">I")
DEFAULT_PORT = 6787


def _send(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(_HDR.pack(len(payload)) + payload)


def _recv(conn: socket.socket) -> bytes | None:
    hdr = b""
    while len(hdr) < 4:
        chunk = conn.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (length,) = _HDR.unpack(hdr)
    buf = b""
    while len(buf) < length:
        chunk = conn.recv(min(65536, length - len(buf)))
        if not chunk:
            return None
        buf += chunk
    return buf


class AqServer:
    def __init__(self, host: str = "127.0.0.1", port: int = DEFAULT_PORT,
                 session: Session | None = None):
        self.session = session or Session()
        self.host = host
        self.port = port
        self._sock: socket.socket | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()   # one query at a time on the device

    def serve_forever(self) -> None:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((self.host, self.port))
        s.listen(16)
        s.settimeout(0.5)
        self._sock = s
        self.port = s.getsockname()[1]
        while not self._stop.is_set():
            try:
                conn, _ = s.accept()
            except socket.timeout:
                continue
            t = threading.Thread(target=self._client_loop, args=(conn,),
                                 daemon=True)
            t.start()
        s.close()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        import time

        while self._sock is None:
            time.sleep(0.01)
        return t

    def shutdown(self) -> None:
        self._stop.set()

    def _client_loop(self, conn: socket.socket) -> None:
        with conn:
            while True:
                msg = _recv(conn)
                if msg is None:
                    return
                sql = msg.decode("utf-8")
                try:
                    with self._lock:
                        r = self.session.execute(sql)
                    if r is None:
                        _send(conn, b"N")
                    else:
                        import io

                        buf = io.StringIO()
                        buf.write(",".join(r.column_names()) + "\n")
                        for row in r.rows():
                            buf.write(",".join(
                                ";".join(map(str, v)) if isinstance(v, list)
                                else str(v) for v in row) + "\n")
                        _send(conn, b"R" + buf.getvalue().encode("utf-8"))
                except Exception as e:
                    _send(conn, b"E" + str(e).encode("utf-8"))


class AqClient:
    def __init__(self, host: str = "127.0.0.1", port: int = DEFAULT_PORT):
        self.conn = socket.create_connection((host, port))

    def execute(self, sql: str):
        """→ None (no result), list-of-rows, or raises RuntimeError."""
        _send(self.conn, sql.encode("utf-8"))
        resp = _recv(self.conn)
        if resp is None:
            raise ConnectionError("server closed")
        tag, payload = resp[:1], resp[1:].decode("utf-8")
        if tag == b"N":
            return None
        if tag == b"E":
            raise RuntimeError(payload)
        lines = payload.strip().splitlines()
        header = lines[0].split(",") if lines else []
        rows = [tuple(line.split(",")) for line in lines[1:]]
        return {"columns": header, "rows": rows}

    def close(self) -> None:
        self.conn.close()


def main(argv=None) -> int:
    import sys

    argv = sys.argv[1:] if argv is None else argv
    host = argv[0] if argv else "127.0.0.1"
    port = int(argv[1]) if len(argv) > 1 else DEFAULT_PORT
    srv = AqServer(host, port)
    print(f"aquery2_tpu server on {host}:{port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
