"""Shared nonblocking TCP broadcast server for output plugins.

The reference repeats the accept/broadcast/drop-dead-client pattern in each
server plugin (python/sbs1.py, python/raw_server.py); here it is one class.
Semantics preserved from those plugins: nonblocking accept folded into the
send path, bounded (1 s timeout) sends so a stalled client cannot block the
decode loop, and drop-and-continue on any client error (SURVEY.md §5.3).
"""

from __future__ import annotations

import socket
import threading
from typing import List


class broadcast_server:
    """TCP server broadcasting byte payloads to every connected client."""

    def __init__(self, port: int, host: str = "0.0.0.0"):
        self._clients: List[socket.socket] = []
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(5)
        self._srv.setblocking(False)
        self.port = self._srv.getsockname()[1]

    def _accept(self) -> None:
        while True:
            try:
                c, _ = self._srv.accept()
            except (BlockingIOError, OSError):
                return
            # bounded send: a client that stops reading must not stall the
            # decode loop (output() runs synchronously per message) — on
            # timeout the client is dropped, honoring drop-and-continue
            c.settimeout(1.0)
            with self._lock:
                self._clients.append(c)

    def broadcast(self, data: bytes) -> None:
        self._accept()
        with self._lock:
            dead = []
            for c in self._clients:
                try:
                    c.sendall(data)
                except (socket.timeout, OSError):
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
