// JS-render sidecar for pyspider_ray — the bundled sidecar program the
// reference ships as fetcher/phantomjs_fetcher.js / puppeteer_fetcher.js:
// an HTTP server that accepts the fetcher's request spec as a JSON POST
// and answers the render-result JSON
//   {orig_url, status_code, error, content, headers, url, cookies,
//    time, js_script_result, save}
// (phantomjs_fetcher.js:135-208 make_result/_make_result contract).
//
// This implementation runs on plain node with NO headless browser: it
// fetches the page over http/https (redirects followed by hand so the
// FIRST non-30x response supplies status/headers, matching
// phantomjs_fetcher.js:103-106 first_response), accumulates Set-Cookie
// across hops, and evaluates fetch.js_script in a `vm` sandbox exposing
// a minimal document/window view of the fetched HTML — scripts compute
// over the source text rather than a live DOM.  Everything else on the
// wire is protocol-exact, so HttpFetcher's S9 path runs end-to-end
// against a real sidecar subprocess.
//
// Usage: node js_fetcher.js <portnumber>   (same CLI as the reference)

'use strict';

const http = require('http');
const https = require('https');
const vm = require('vm');

const port = process.argv[2];
if (!port) {
  console.log('Usage: js_fetcher.js <portnumber>');
  process.exit(1);
}

const MAX_REDIRECTS = 5;

function parseSetCookies(headers, jar) {
  for (const line of headers['set-cookie'] || []) {
    const first = line.split(';', 1)[0];
    const eq = first.indexOf('=');
    if (eq > 0) jar[first.slice(0, eq).trim()] = first.slice(eq + 1).trim();
  }
}

function fetchOnce(url, spec, cb) {
  let u;
  try { u = new URL(url); } catch (e) { return cb(e, null, ''); }
  const mod = u.protocol === 'https:' ? https : http;
  const headers = {};
  for (const [k, v] of Object.entries(spec.headers || {})) {
    const lk = k.toLowerCase();
    // phantomjs_fetcher.js:65-68 strips these before the request
    if (lk === 'accept-encoding' || lk === 'connection' ||
        lk === 'content-length' || v === undefined || v === null) continue;
    headers[k] = v;
  }
  headers['Accept-Encoding'] = 'identity';
  const req = mod.request(u, {
    method: spec.method || 'GET',
    headers,
    timeout: (spec.timeout ? spec.timeout : 20) * 1000,
  }, (res) => {
    const chunks = [];
    res.on('data', (c) => chunks.push(c));
    res.on('end', () => cb(null, res, Buffer.concat(chunks).toString('utf8')));
  });
  req.on('timeout', () => req.destroy(new Error('resource timeout')));
  req.on('error', (e) => cb(e, null, ''));
  if (spec.data) req.write(spec.data);
  req.end();
}

function fetchFollowing(spec, jar, cb, url, hops, first) {
  url = url || spec.url;
  fetchOnce(url, spec, (err, res, body) => {
    if (err) return cb(err, first, url, body);
    parseSetCookies(res.headers, jar);
    const code = res.statusCode;
    // first_response skips 301/302 (phantomjs_fetcher.js:104)
    if (first === null && code !== 301 && code !== 302) first = res;
    if (code >= 300 && code < 400 && res.headers.location) {
      if (hops >= MAX_REDIRECTS) {
        return cb(new Error('too many redirects'), first, url, body);
      }
      const next = new URL(res.headers.location, url).toString();
      const nextSpec = { ...spec, method: 'GET', data: undefined };
      return fetchFollowing(nextSpec, jar, cb, next, hops + 1,
                            first === res ? null : first);
    }
    cb(null, first || res, url, body);
  });
}

function runScript(script, content, url) {
  // fetch.js_script is a function expression evaluated in page context
  // (phantomjs_fetcher.js:82-96); here the "page" is a source-text view.
  const logs = [];
  const sandbox = {
    console: { log: (...a) => logs.push(a.join(' ')) },
    document: {
      title: (content.match(/<title[^>]*>([^<]*)<\/title>/i) || [, ''])[1],
      documentElement: { outerHTML: content },
      body: { innerHTML: content },
      location: { href: url },
    },
  };
  sandbox.window = sandbox;
  sandbox.globalThis = sandbox;
  const result = vm.runInNewContext(
    '(' + script + ')()', sandbox, { timeout: 5000 });
  for (const l of logs) console.log('console: ' + l);
  return result === undefined ? null : result;
}

const server = http.createServer((req, res) => {
  if (req.method !== 'POST') {     // phantomjs_fetcher.js:26-36
    const body = 'method not allowed!';
    res.writeHead(403, { Cache: 'no-cache',
                         'Content-Length': body.length });
    res.end(body);
    return;
  }
  const chunks = [];
  req.on('data', (c) => chunks.push(c));
  req.on('end', () => {
    const start = Date.now();
    let fetch;
    try {
      fetch = JSON.parse(Buffer.concat(chunks).toString('utf8'));
    } catch (e) {
      res.writeHead(400, { 'Content-Type': 'application/json' });
      res.end(JSON.stringify({ error: 'bad json: ' + e }));
      return;
    }
    const jar = {};
    const finish = (result) => {
      const body = JSON.stringify(result, null, 2);
      res.writeHead(200, { Cache: 'no-cache',
                           'Content-Type': 'application/json' });
      res.end(body);
      console.log('[' + result.status_code + '] ' + result.orig_url +
                  ' ' + result.time);
    };
    fetchFollowing(fetch, jar, (err, first, finalUrl, content) => {
      if (err && first === null) {
        finish({
          orig_url: fetch.url, status_code: 599, error: err.toString(),
          content: content || '', headers: {}, url: finalUrl || fetch.url,
          cookies: jar, time: (Date.now() - start) / 1000,
          js_script_result: null, save: fetch.save,
        });
        return;
      }
      let scriptResult = null, scriptError = '';
      if (fetch.js_script) {
        try {
          scriptResult = runScript(fetch.js_script, content, finalUrl);
        } catch (e) {
          scriptError = 'js_script: ' + e;
          console.log(scriptError);
        }
      }
      finish({
        orig_url: fetch.url,
        status_code: first ? first.statusCode : 599,
        error: err ? err.toString() : (scriptError || undefined),
        content,
        headers: first ? Object.fromEntries(
          Object.entries(first.headers)
            .filter(([k]) => k !== 'set-cookie')) : {},
        url: finalUrl,
        cookies: jar,
        time: (Date.now() - start) / 1000,
        js_script_result: scriptResult,
        save: fetch.save,
      });
    }, null, 0, null);
  });
});

server.listen(Number(port), '127.0.0.1', () => {
  // the launcher (and the reference's run.py) waits for this line
  console.log('js fetcher running on port ' + port);
});
