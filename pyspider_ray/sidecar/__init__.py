"""JS-render sidecar launcher (S9) — the process-management half of
the reference's phantomjs/puppeteer integration (run.py spawns the
sidecar program and hands its address to the fetcher as
``phantomjs_proxy``).  The bundled sidecar program is
``js_fetcher.js`` (this directory): a node HTTP server speaking the
exact render-fetch wire protocol of the reference's
``fetcher/phantomjs_fetcher.js`` — JSON request spec in, result dict
(status_code/content/headers/url/cookies/time/js_script_result/save)
out.  ``HttpFetcher(js_proxy=sidecar.url)`` then fetches
``fetch_type='js'`` tasks through it end-to-end.

No headless browser exists in this sandbox, so the bundled program
fetches pages without executing page scripts and evaluates
``js_script`` against a source-text document view — the protocol,
process lifecycle, and data plumbing are real; swap in the
reference's phantomjs/puppeteer program unchanged where a browser is
installed (the CLI contract ``<program> <port>`` and the wire
protocol are identical).
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import time

SIDECAR_JS = os.path.join(os.path.dirname(__file__), "js_fetcher.js")


def node_available() -> bool:
    return shutil.which("node") is not None


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class JsSidecar:
    """A running sidecar subprocess; context manager.

    >>> with JsSidecar() as sc:
    ...     fetcher = HttpFetcher(js_proxy=sc.url)
    """

    def __init__(self, port: int = 0, program: str | None = None,
                 node: str = "node", startup_timeout: float = 10.0):
        self.port = port or _free_port()
        self.url = f"http://127.0.0.1:{self.port}"
        program = program or SIDECAR_JS
        self.proc = subprocess.Popen(
            [node, program, str(self.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        # wait for the ready line (reference run.py waits on the
        # phantomjs banner the same way), then for the socket
        deadline = time.monotonic() + startup_timeout
        line = self.proc.stdout.readline()
        if "running on port" not in line:
            self.stop()
            raise RuntimeError(f"sidecar failed to start: {line!r}")
        while time.monotonic() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", self.port),
                                              timeout=1):
                    return
            except OSError:
                time.sleep(0.05)
        self.stop()
        raise RuntimeError("sidecar never opened its port")

    def stop(self) -> None:
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(timeout=5)

    def __enter__(self) -> "JsSidecar":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
