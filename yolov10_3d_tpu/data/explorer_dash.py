"""Dataset-explorer web dashboard, zero-dependency (stdlib http.server).

Reference: data/explorer/gui/dash.py:268 — a streamlit app with an SQL query
box, an ai-query box, per-image similarity search, and an image grid.
This image has no streamlit/gradio, so the dashboard is a small single-file
HTTP app over the same Explorer surface: ``/api/sql`` (sqlite3-backed
``Explorer.sql_query``), ``/api/similar`` (cosine top-k), ``/api/index``
(duplicate finder), and an inline-JS front page rendering results as an
image grid. Image bytes are served only for paths present in the embeddings
table (no directory traversal).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>yolov10-3d-tpu explorer</title>
<style>
 body{font-family:sans-serif;margin:1.5rem;background:#fafafa}
 h2{margin:.2rem 0 1rem} .row{margin:.6rem 0}
 input[type=text]{width:34rem;padding:.35rem} button{padding:.35rem .9rem}
 #grid,#simgrid{display:grid;grid-template-columns:repeat(auto-fill,minmax(160px,1fr));gap:8px;margin-top:.6rem}
 .cell{background:#fff;border:1px solid #ddd;border-radius:4px;padding:4px;font-size:11px;word-break:break-all}
 .cell img{width:100%;display:block;border-radius:3px}
 table{border-collapse:collapse;font-size:12px;margin-top:.6rem}
 td,th{border:1px solid #ccc;padding:2px 8px}
 .err{color:#b00;white-space:pre-wrap}
</style></head><body>
<h2>Dataset explorer</h2>
<div class="row">
 <input id="sql" type="text" placeholder="WHERE labels LIKE '%person%' AND n_labels &gt; 2"
        value="SELECT * FROM 'table' LIMIT 16">
 <button onclick="runSQL()">Run SQL</button>
</div>
<div id="sqlerr" class="err"></div><div id="grid"></div>
<div class="row">
 <select id="pick"></select> <input id="limit" type="text" value="9" size="3">
 <button onclick="runSim()">Find similar</button>
</div>
<div id="simgrid"></div>
<div class="row"><button onclick="runIdx()">Similarity index (duplicates)</button></div>
<div id="idx"></div>
<script>
const J=u=>fetch(u).then(r=>r.json());
function cell(r){const d=document.createElement('div');d.className='cell';
 if(r.im_file){const i=document.createElement('img');
  i.src='/img?path='+encodeURIComponent(r.im_file);d.appendChild(i);}
 const t=document.createElement('div');
 t.textContent=Object.entries(r).filter(([k])=>k!='im_file')
   .map(([k,v])=>k+'='+JSON.stringify(v)).join(' ')
   +' '+(r.im_file||'').split('/').pop();
 d.appendChild(t);return d;}
function fill(el,rows){el.innerHTML='';rows.forEach(r=>el.appendChild(cell(r)));}
function runSQL(){J('/api/sql?q='+encodeURIComponent(document.getElementById('sql').value))
 .then(d=>{document.getElementById('sqlerr').textContent=d.error||'';
  fill(document.getElementById('grid'),d.rows||[]);});}
function runSim(){const p=document.getElementById('pick').value,
 l=document.getElementById('limit').value;
 J('/api/similar?img='+encodeURIComponent(p)+'&limit='+l)
 .then(d=>fill(document.getElementById('simgrid'),d.rows||[]));}
function runIdx(){J('/api/index?top_k=3').then(d=>{
 const rows=d.rows||[],t=document.createElement('table');
 t.innerHTML='<tr><th>image</th><th>nearest</th><th>scores</th></tr>';
 rows.forEach(r=>{const tr=document.createElement('tr');
  tr.innerHTML='<td>'+r.im_file.split('/').pop()+'</td><td>'
   +r.similar.map(s=>s.split('/').pop()).join(', ')+'</td><td>'
   +r.scores.map(s=>s.toFixed(3)).join(', ')+'</td>';t.appendChild(tr);});
 const el=document.getElementById('idx');el.innerHTML='';el.appendChild(t);});}
J('/api/files').then(d=>{const s=document.getElementById('pick');
 (d.files||[]).forEach(f=>{const o=document.createElement('option');
  o.value=f;o.textContent=f.split('/').pop();s.appendChild(o);});});
runSQL();
</script></body></html>"""

_MIME = {".jpg": "image/jpeg", ".jpeg": "image/jpeg", ".png": "image/png",
         ".bmp": "image/bmp"}


class ExplorerDashboard:
    """Serve an :class:`Explorer` (with a built embeddings table) over HTTP."""

    def __init__(self, explorer, names=None):
        explorer._require_table()
        self.explorer = explorer
        self.names = names or (getattr(explorer.model, "names", None) or {})
        # exact-path allowlist for /img — only table rows are servable
        self._servable = {str(p) for p in explorer.table["im_file"]}
        self.server = None

    # -- request handling ---------------------------------------------------
    def _api(self, path: str, q: dict):
        ex = self.explorer
        if path == "/api/files":
            return {"files": [str(p) for p in ex.table["im_file"]]}
        if path == "/api/sql":
            try:
                rows = ex.sql_query(q.get("q", [""])[0], names=self.names,
                                    limit=int(q.get("limit", ["64"])[0]))
                return {"rows": rows}
            except Exception as e:  # surface SQL errors to the page
                return {"rows": [], "error": f"{type(e).__name__}: {e}"}
        if path == "/api/similar":
            limit = int(q.get("limit", ["9"])[0])
            if "idx" in q:
                rows = ex.get_similar(idx=int(q["idx"][0]), limit=limit)
            else:
                img = q.get("img", [""])[0]
                if img not in self._servable:
                    return {"rows": [], "error": "unknown image"}
                rows = ex.get_similar(img=img, limit=limit)
            return {"rows": rows}
        if path == "/api/index":
            rows = ex.similarity_index(top_k=int(q.get("top_k", ["5"])[0]))
            return {"rows": rows[: int(q.get("limit", ["100"])[0])]}
        return None

    def _handler(self):
        dash = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path in ("/", "/index.html"):
                    return self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
                if u.path == "/img":
                    p = q.get("path", [""])[0]
                    if p not in dash._servable or not Path(p).exists():
                        return self._send(404, b"not found", "text/plain")
                    ctype = _MIME.get(Path(p).suffix.lower(), "application/octet-stream")
                    return self._send(200, Path(p).read_bytes(), ctype)
                try:
                    out = dash._api(u.path, q)
                except Exception as e:  # bad int params, out-of-range idx...
                    body = json.dumps(
                        {"rows": [], "error": f"{type(e).__name__}: {e}"}
                    ).encode()
                    return self._send(400, body, "application/json")
                if out is None:
                    return self._send(404, b"not found", "text/plain")
                return self._send(200, json.dumps(out).encode(), "application/json")

        return Handler

    # -- lifecycle ------------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 7861,
              blocking: bool = True):
        """Start the dashboard; ``port=0`` picks a free port. Non-blocking
        mode runs the server on a daemon thread and returns it (use
        ``.server.shutdown()`` to stop)."""
        self.server = ThreadingHTTPServer((host, port), self._handler())
        if blocking:
            try:
                print(f"explorer dashboard: http://{host}:{self.server.server_address[1]}")
                self.server.serve_forever()
            finally:
                self.server.server_close()
        else:
            t = threading.Thread(target=self.server.serve_forever, daemon=True)
            t.start()
        return self.server
