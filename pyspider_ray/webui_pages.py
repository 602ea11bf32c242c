"""Browser UI for the crawl pipeline — the reference webui's dashboard
(`/root/reference/pyspider/webui/index.py` + `templates/index.html`)
and script debugger (`webui/debug.py` + `templates/debug.html`)
re-expressed as two self-contained HTML pages over the existing JSON
API (webapi.py).  No template engine, no static assets: the pages are
vanilla HTML+JS fetching /projects /queues /counters /metrics
/active_tasks /results, and POSTing the runtime-control verbs
(pause/unpause/rate), the debugger (/debug) and the script editor's
save (/projects/<name>/script)."""

from __future__ import annotations

_STYLE = """
  body { font-family: -apple-system, 'Segoe UI', sans-serif; margin: 0;
         background: #f5f6f8; color: #1c2430; }
  header { background: #233044; color: #fff; padding: 10px 18px;
           display: flex; align-items: baseline; gap: 18px; }
  header h1 { font-size: 17px; margin: 0; }
  header a { color: #9fc2ff; text-decoration: none; font-size: 13px; }
  main { padding: 16px 18px; max-width: 1200px; margin: 0 auto; }
  table { border-collapse: collapse; width: 100%; background: #fff;
          box-shadow: 0 1px 2px rgba(0,0,0,.08); font-size: 13px; }
  th, td { text-align: left; padding: 6px 10px;
           border-bottom: 1px solid #e4e7ec; }
  th { background: #eef1f5; font-weight: 600; }
  tr:last-child td { border-bottom: none; }
  button { font-size: 12px; padding: 3px 10px; margin-right: 4px;
           border: 1px solid #b9c2d0; border-radius: 4px;
           background: #fff; cursor: pointer; }
  button:hover { background: #e8eefb; }
  input { font-size: 12px; padding: 3px 6px; border: 1px solid #b9c2d0;
          border-radius: 4px; }
  .pill { display: inline-block; border-radius: 10px; padding: 1px 9px;
          font-size: 11px; color: #fff; }
  .run { background: #2f9e44; } .paused { background: #e8590c; }
  .stopped { background: #868e96; }
  h2 { font-size: 14px; margin: 22px 0 8px; }
  pre { background: #1c2430; color: #d6e2f0; padding: 10px;
        border-radius: 6px; font-size: 12px; overflow: auto;
        max-height: 320px; }
  .cols { display: flex; gap: 14px; align-items: stretch; }
  .cols > div { flex: 1; min-width: 0; }
  textarea { width: 100%; box-sizing: border-box; font-family: monospace;
             font-size: 12px; border: 1px solid #b9c2d0;
             border-radius: 6px; padding: 8px; background: #fff; }
  .bar { margin: 8px 0; display: flex; gap: 8px; align-items: center; }
  #status { font-size: 12px; color: #555; }
  .err { color: #c92a2a; }
"""

INDEX_HTML = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pyspider_ray dashboard</title>
<style>{_STYLE}</style></head>
<body>
<header><h1>pyspider_ray</h1><a href="/">dashboard</a>
<a href="/debug">debug</a><span id="status"></span></header>
<main>
<table id="projects"><thead><tr>
  <th>project</th><th>status</th><th>rate / burst</th><th>queue</th>
  <th>5m counters</th><th>actions</th>
</tr></thead><tbody></tbody></table>

<h2>recent rounds</h2>
<table id="rounds"><thead><tr>
  <th>round</th><th>selected</th><th>fetched</th><th>new tasks</th>
  <th>results</th><th>sec</th>
</tr></thead><tbody></tbody></table>

<h2>active tasks</h2>
<table id="active"><thead><tr>
  <th>time</th><th>project</th><th>url</th>
</tr></thead><tbody></tbody></table>

<h2>results <span id="rescount"></span></h2>
<table id="results"><thead><tr>
  <th>taskid</th><th>url</th><th>result</th>
</tr></thead><tbody></tbody></table>
</main>
<script>
const esc = s => String(s ?? "").replace(/[&<>"]/g,
  c => ({{"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}})[c]);
async function j(path, opts) {{
  const r = await fetch(path, opts);
  return r.json();
}}
async function post(path, body) {{
  await j(path, {{method: "POST",
                  headers: {{"Content-Type": "application/json"}},
                  body: JSON.stringify(body || {{}})}});
  refresh();
}}
function setRate(name) {{
  const rate = document.getElementById("rate-" + name).value;
  const burst = document.getElementById("burst-" + name).value;
  post(`/projects/${{name}}/rate`,
       {{rate: parseFloat(rate), burst: parseFloat(burst)}});
}}
async function refresh() {{
  try {{
    const [projects, queues, counters, metrics, active, results] =
      await Promise.all([j("/projects"), j("/queues"),
                         j("/counters?window=5m"), j("/metrics"),
                         j("/active_tasks"),
                         j("/results?limit=10")]);
    document.querySelector("#projects tbody").innerHTML =
      projects.map(p => {{
        const st = !p.active ? ["stopped", "STOPPED"]
                 : p.paused ? ["paused", "PAUSED"] : ["run", "RUNNING"];
        const c = counters[p.name] || {{}};
        return `<tr><td>${{esc(p.name)}}</td>
          <td><span class="pill ${{st[0]}}">${{st[1]}}</span></td>
          <td><input id="rate-${{esc(p.name)}}" size=4
                     value="${{p.rate}}"> /
              <input id="burst-${{esc(p.name)}}" size=4
                     value="${{p.burst}}"></td>
          <td>${{queues[p.name] ?? 0}}</td>
          <td>${{esc(JSON.stringify(c))}}</td>
          <td><button onclick="post('/projects/${{esc(p.name)}}/pause')">
                pause</button>
              <button onclick="post('/projects/${{esc(p.name)}}/unpause')">
                unpause</button>
              <button onclick="setRate('${{esc(p.name)}}')">set rate
              </button></td></tr>`;
      }}).join("");
    document.querySelector("#rounds tbody").innerHTML =
      metrics.slice(-8).reverse().map(m =>
        `<tr><td>${{m.round}}</td><td>${{m.selected ?? ""}}</td>
         <td>${{m.fetched ?? ""}}</td><td>${{m.new_tasks ?? ""}}</td>
         <td>${{m.results ?? ""}}</td>
         <td>${{(m.sec ?? 0).toFixed(3)}}</td>
         </tr>`).join("");
    document.querySelector("#active tbody").innerHTML =
      active.slice(0, 10).map(([ts, t]) =>
        `<tr><td>${{new Date(ts * 1000).toISOString()}}</td>
         <td>${{esc(t.project)}}</td><td>${{esc(t.url)}}</td></tr>`)
      .join("");
    document.getElementById("rescount").textContent =
      `(${{results.count}} rows)`;
    document.querySelector("#results tbody").innerHTML =
      results.results.map(r =>
        `<tr><td>${{esc(r.taskid)}}</td><td>${{esc(r.url)}}</td>
         <td>${{esc(JSON.stringify(r.result ?? r.caption ?? ""))
                .slice(0, 120)}}</td></tr>`).join("");
    document.getElementById("status").textContent =
      "updated " + new Date().toLocaleTimeString();
  }} catch (e) {{
    document.getElementById("status").textContent = "refresh failed: " + e;
  }}
}}
refresh();
setInterval(refresh, 2000);
</script>
</body></html>
"""

DEBUG_HTML = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pyspider_ray debug</title>
<style>{_STYLE}</style></head>
<body>
<header><h1>pyspider_ray</h1><a href="/">dashboard</a>
<a href="/debug">debug</a><span id="status"></span></header>
<main>
<div class="bar">
  <label>url <input id="url" size="50" value="data:,on_start"></label>
  <button id="run">run</button>
  <button id="save">save script</button>
  <span id="msg"></span>
</div>
<div class="cols">
  <div>
    <h2>script</h2>
    <textarea id="script" rows="28" spellcheck="false"></textarea>
  </div>
  <div>
    <h2>fetch + follows</h2>
    <pre id="fetch"></pre>
    <h2>result / messages / logs</h2>
    <pre id="out"></pre>
  </div>
</div>
</main>
<script>
const msg = (t, err) => {{
  const el = document.getElementById("msg");
  el.textContent = t; el.className = err ? "err" : "";
}};
async function j(path, opts) {{
  const r = await fetch(path, opts);
  return r.json();
}}
async function load() {{
  const s = await j("/debug/script");
  document.getElementById("script").value = s.script || "";
  if (s.path) msg("loaded " + s.path);
}}
document.getElementById("run").onclick = async () => {{
  msg("running…");
  const out = await j("/debug", {{method: "POST",
    headers: {{"Content-Type": "application/json"}},
    body: JSON.stringify({{
      script: document.getElementById("script").value,
      url: document.getElementById("url").value}})}});
  document.getElementById("fetch").textContent =
    JSON.stringify({{fetch: out.fetch, follows: out.follows}}, null, 2);
  document.getElementById("out").textContent = JSON.stringify(
    {{ok: out.ok, result: out.result, messages: out.messages,
      logs: out.logs, exception: out.exception, time: out.time}},
    null, 2);
  msg(out.ok ? "ok (" + (out.time || 0).toFixed(3) + "s)"
             : "failed: " + (out.exception || "see output"), !out.ok);
}};
document.getElementById("save").onclick = async () => {{
  msg("saving…");
  const name = (await j("/projects"))[0]?.name || "bench";
  const out = await j(`/projects/${{name}}/script`, {{method: "POST",
    headers: {{"Content-Type": "application/json"}},
    body: JSON.stringify({{
      script: document.getElementById("script").value}})}});
  msg(out.saved ? "saved + hot-swap queued (" + out.path + ")"
                : "save failed: " + (out.error || "?"), !out.saved);
}};
load();
</script>
</body></html>
"""

# what the debug editor opens when the crawl isn't script-driven — the
# reference's new-project scaffold (webui/index.py 'create' →
# libs/sample_handler.py), adapted to the synthetic-web fetcher
SAMPLE_SCRIPT = '''\
# rate: 10
# burst: 20
from pyspider.libs.base_handler import *


class Handler(BaseHandler):
    crawl_config = {}

    @every(minutes=24 * 60)
    def on_start(self, response):
        self.crawl("http://bench-000.test/page/0", callback=self.on_page)

    @config(age=10 * 24 * 60 * 60)
    def on_page(self, response):
        for a in response.doc("a[href]"):
            self.crawl(a.attr("href"), callback=self.on_page)
        return {"url": response.url,
                "title": [t.text() for t in response.doc("title")]}
'''
