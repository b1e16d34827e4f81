"""Raw TCP server (ref: gr-air-modes python/raw_server.py output_raw).

Broadcasts the raw hex frame strings to all connected clients — the "feed
another decoder" path. Lines are `*<hex>;` (AVR format) so downstream
dump1090-style consumers can ingest them, plus the framework's native wire
string on request.
"""

from __future__ import annotations

import socket
import threading
from typing import List


class output_raw:
    def __init__(self, port: int = 9988, host: str = "0.0.0.0",
                 avr_format: bool = True):
        self._avr = avr_format
        self._clients: List[socket.socket] = []
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(5)
        self._srv.setblocking(False)
        self.port = self._srv.getsockname()[1]

    def _accept(self):
        while True:
            try:
                c, _ = self._srv.accept()
            except (BlockingIOError, OSError):
                return
            # bounded send so one stalled client cannot block the decode
            # loop; on timeout the client is dropped (drop-and-continue)
            c.settimeout(1.0)
            with self._lock:
                self._clients.append(c)

    def output(self, msg: str) -> None:
        self._accept()
        if self._avr:
            parts = msg.split()
            if len(parts) < 2:
                return
            line = f"*{parts[1]};\n"
        else:
            line = msg + "\n"
        data = line.encode()
        with self._lock:
            dead = []
            for c in self._clients:
                try:
                    c.sendall(data)
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)
                try:
                    c.close()
                except OSError:
                    pass

    def close(self) -> None:
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()
        self._srv.close()
