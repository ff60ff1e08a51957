"""In-process stub of an Iceberg REST catalog server — the local analog of
the ``apache/iceberg-rest-fixture`` container the reference's CI runs
(``/root/reference/.github/workflows/build.yml:6-31``).

Implements the subset of the REST catalog protocol the RestCatalog client
speaks: config, oauth token exchange, namespace CRUD + properties, table
list/create/load/commit(CAS)/drop/purge/rename/register.  State is held in
memory; table metadata documents are stored verbatim with a version
counter that the commit endpoint compare-and-swaps."""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_NS_SEP = "\x1f"


class _State:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.lock = threading.Lock()
        self.namespaces: dict[tuple, dict] = {}
        self.tables: dict[tuple, dict] = {}  # ident -> {location, metadata}


def _split_ns(enc: str) -> tuple:
    return tuple(urllib.parse.unquote(enc).split(_NS_SEP))


class _Handler(BaseHTTPRequestHandler):
    state: _State
    required_token: str | None = None

    # -- plumbing ----------------------------------------------------------
    def log_message(self, *a):  # silence
        pass

    def _send(self, status: int, body: dict | None = None):
        data = json.dumps(body or {}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(data)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        raw = self.rfile.read(n).decode()
        ctype = self.headers.get("Content-Type", "")
        if "json" in ctype:
            return json.loads(raw)
        return dict(urllib.parse.parse_qsl(raw))

    def _auth_ok(self) -> bool:
        if self.required_token is None:
            return True
        if self.path.endswith("/v1/oauth/tokens"):
            return True
        return self.headers.get("Authorization") == f"Bearer {self.required_token}"

    def _route(self):
        if not self._auth_ok():
            return self._send(401, {"error": "unauthorized"})
        path, _, query = self.path.partition("?")
        params = dict(urllib.parse.parse_qsl(query))
        m = self.command
        s = self.state
        with s.lock:
            # config + oauth
            if path == "/v1/config" and m == "GET":
                return self._send(200, {"defaults": {}, "overrides": {"prefix": "main"}})
            if path == "/v1/oauth/tokens" and m == "POST":
                body = self._body()
                if body.get("grant_type") != "client_credentials":
                    return self._send(400, {"error": "unsupported grant"})
                return self._send(
                    200,
                    {
                        "access_token": f"oauth-{body.get('client_id')}",
                        "token_type": "bearer",
                    },
                )
            if not path.startswith("/v1/main/"):
                return self._send(404, {"error": "unknown prefix"})
            rest = path[len("/v1/main/"):]

            # namespaces collection
            if rest == "namespaces" and m == "GET":
                parent = tuple(params["parent"].split(_NS_SEP)) if params.get("parent") else ()
                if parent and parent not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                out = [
                    list(ns)
                    for ns in s.namespaces
                    if len(ns) == len(parent) + 1 and ns[: len(parent)] == parent
                ]
                return self._send(200, {"namespaces": out})
            if rest == "namespaces" and m == "POST":
                body = self._body()
                ns = tuple(body["namespace"])
                if ns in s.namespaces:
                    return self._send(409, {"error": "namespace exists"})
                if len(ns) > 1 and ns[:-1] not in s.namespaces:
                    return self._send(404, {"error": "no parent namespace"})
                s.namespaces[ns] = dict(body.get("properties") or {})
                return self._send(200, {"namespace": list(ns), "properties": s.namespaces[ns]})

            # tables/rename
            if rest == "tables/rename" and m == "POST":
                body = self._body()
                src = (*body["source"]["namespace"], body["source"]["name"])
                dst = (*body["destination"]["namespace"], body["destination"]["name"])
                if src not in s.tables:
                    return self._send(404, {"error": "no such table"})
                if dst[:-1] not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                if dst in s.tables:
                    return self._send(409, {"error": "table exists"})
                s.tables[dst] = s.tables.pop(src)
                return self._send(200, {})

            # namespace-scoped
            mm = re.match(r"^namespaces/([^/]+)$", rest)
            if mm:
                ns = _split_ns(mm.group(1))
                if ns not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                if m in ("GET", "HEAD"):
                    return self._send(
                        200, {"namespace": list(ns), "properties": s.namespaces[ns]}
                    )
                if m == "DELETE":
                    has_child = any(
                        n[: len(ns)] == ns and len(n) > len(ns) for n in s.namespaces
                    )
                    has_tbl = any(t[:-1] == ns for t in s.tables)
                    if has_child or has_tbl:
                        return self._send(409, {"error": "namespace not empty"})
                    del s.namespaces[ns]
                    return self._send(200)
            mm = re.match(r"^namespaces/([^/]+)/properties$", rest)
            if mm and m == "POST":
                ns = _split_ns(mm.group(1))
                if ns not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                body = self._body()
                for k in body.get("removals", []):
                    s.namespaces[ns].pop(k, None)
                s.namespaces[ns] = dict(body.get("updates") or {})
                return self._send(200, {})
            mm = re.match(r"^namespaces/([^/]+)/tables$", rest)
            if mm:
                ns = _split_ns(mm.group(1))
                if ns not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                if m == "GET":
                    idents = [
                        {"namespace": list(t[:-1]), "name": t[-1]}
                        for t in s.tables
                        if t[:-1] == ns
                    ]
                    return self._send(200, {"identifiers": idents})
                if m == "POST":  # create
                    body = self._body()
                    ident = (*ns, body["name"])
                    if ident in s.tables:
                        return self._send(409, {"error": "table exists"})
                    s.tables[ident] = {
                        "location": body.get("location"),
                        "metadata": body["metadata"],
                    }
                    return self._send(200, self._table_doc(ident))
            mm = re.match(r"^namespaces/([^/]+)/register$", rest)
            if mm and m == "POST":
                ns = _split_ns(mm.group(1))
                if ns not in s.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                body = self._body()
                ident = (*ns, body["name"])
                if ident in s.tables:
                    return self._send(409, {"error": "table exists"})
                s.tables[ident] = {
                    "location": body.get("location"),
                    "metadata": body["metadata"],
                }
                return self._send(200, self._table_doc(ident))
            mm = re.match(r"^namespaces/([^/]+)/tables/([^/]+)$", rest)
            if mm:
                ns = _split_ns(mm.group(1))
                name = urllib.parse.unquote(mm.group(2))
                ident = (*ns, name)
                if ident not in s.tables:
                    return self._send(404, {"error": "no such table"})
                if m in ("GET", "HEAD"):
                    return self._send(200, self._table_doc(ident))
                if m == "DELETE":
                    del s.tables[ident]
                    return self._send(200)
                if m == "POST":  # commit
                    body = self._body()
                    reqs = body.get("requirements", [])
                    cur = int(s.tables[ident]["metadata"].get("__rest-version", 0))
                    for r in reqs:
                        if r.get("type") == "assert-table-version" and int(r.get("version", -1)) != cur:
                            return self._send(409, {"error": f"version {r.get('version')} != {cur}"})
                    for u in body.get("updates", []):
                        if u.get("action") == "set-metadata":
                            new_meta = u["metadata"]
                            if int(new_meta.get("__rest-version", 0)) != cur + 1:
                                return self._send(409, {"error": "non-sequential version"})
                            s.tables[ident]["metadata"] = new_meta
                    return self._send(200, self._table_doc(ident))
        return self._send(404, {"error": f"unhandled {m} {path}"})

    def _table_doc(self, ident: tuple) -> dict:
        t = self.state.tables[ident]
        v = t["metadata"].get("__rest-version", 0)
        return {
            "metadata-location": f"{t['location']}/metadata/v{v}.rest.json",
            "location": t["location"],
            "metadata": t["metadata"],
        }

    do_GET = do_POST = do_DELETE = do_HEAD = _route


class StubRestServer:
    """Context manager: spins the stub on an ephemeral port in a daemon
    thread; ``.uri`` is the base URL to hand to RestCatalog."""

    def __init__(self, warehouse: str = "/tmp", required_token: str | None = None):
        handler = type(
            "BoundHandler",
            (_Handler,),
            {"state": _State(warehouse), "required_token": required_token},
        )
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.uri = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def __enter__(self) -> "StubRestServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
