package graft.archive

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpExchange

/** The human-facing admin layer — the last visible surface of the
  * reference's server: its Thymeleaf admin UI
  * (`cassandra-pv-archiver-server/src/main/resources/META-INF/templates/admin/`
  * — dashboard.html, channels/all.html, channels/details.html,
  * channels/add.html, channels/import.html) re-expressed as ONE static
  * page over the existing wsapi ([[HttpAdminApi]]): the server ships
  * no template engine and no server-side rendering — the page is a
  * fixed byte string and every piece of data on it comes from the same
  * JSON endpoints scripts use, so the UI can never show state the API
  * would not serve.
  *
  * Surface parity with the reference templates: dashboard (server
  * status, totals), channel list with filtering, channel detail
  * (decimation levels, retention, options), add / rename / remove /
  * enable / disable (the reference's edit.html operations, via
  * run-archive-configuration-commands), and XML export/import. Auth
  * rides the API's own HTTP Basic: on a 401 the page asks for
  * credentials and retries — the static page itself carries no data.
  */
object AdminUi {

  val ContextPath = "/admin/ui"

  private[archive] def handle(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "GET") {
      val b = "GET only".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      ex.sendResponseHeaders(405, b.length.toLong)
      ex.getResponseBody.write(b)
      return
    }
    val b = Page.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=UTF-8")
    ex.sendResponseHeaders(200, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  private val Page: String =
    """<!doctype html>
      |<html lang="en"><head><meta charset="utf-8">
      |<title>graft archive admin</title>
      |<style>
      | body{font:14px/1.45 system-ui,sans-serif;margin:0;color:#222}
      | header{background:#1d3557;color:#fff;padding:10px 18px;display:flex;
      |   gap:18px;align-items:baseline}
      | header h1{font-size:17px;margin:0}
      | header span{opacity:.75;font-size:12px}
      | main{max-width:1100px;margin:18px auto;padding:0 16px}
      | h2{font-size:15px;border-bottom:1px solid #ddd;padding-bottom:4px}
      | table{border-collapse:collapse;width:100%}
      | th,td{text-align:left;padding:4px 10px;border-bottom:1px solid #eee;
      |   font-size:13px}
      | tr:hover td{background:#f4f7fb;cursor:pointer}
      | .pill{display:inline-block;border-radius:9px;padding:0 8px;
      |   font-size:11px;color:#fff}
      | .on{background:#2a9d8f}.off{background:#999}
      | input,select,button{font:inherit;padding:3px 8px;margin:2px}
      | button{cursor:pointer;background:#1d3557;color:#fff;border:0;
      |   border-radius:3px}
      | button.warn{background:#b23}
      | pre{background:#f6f6f6;padding:10px;overflow:auto;font-size:12px}
      | #status div{display:inline-block;margin-right:26px}
      | #status b{display:block;font-size:20px}
      | #msg{color:#b23;min-height:18px}
      |</style></head><body>
      |<header><h1>graft archive admin</h1>
      |<span>server <code id="sid">…</code></span>
      |<span id="who"></span></header>
      |<main>
      |<div id="msg"></div>
      |<h2>Dashboard</h2><div id="status">loading…</div>
      |<h2>Servers</h2>
      |<table id="fleet"><thead><tr><th>server</th><th>name</th><th>url</th>
      |  <th>state</th><th>renewed</th></tr></thead><tbody></tbody></table>
      |<h2>Channels <input id="filter" placeholder="filter…" oninput="renderChannels()">
      |  <button onclick="loadAll()">refresh</button>
      |  <a id="xml" href="#">export XML</a>
      |  <input type="file" id="imp" style="display:none" onchange="importXml()">
      |  <button onclick="document.getElementById('imp').click()">import XML</button>
      |</h2>
      |<table id="chans"><thead><tr><th>channel</th><th>data id</th>
      |  <th>control system</th><th>state</th><th>levels</th></tr></thead>
      |  <tbody></tbody></table>
      |<h2>Add channel</h2>
      |<form onsubmit="return addChannel(event)">
      | name <input id="an" required> control system
      | <input id="at" value="ca" size="6">
      | <button>add</button></form>
      |<h2 id="dt" style="display:none">Channel detail</h2>
      |<div id="detail"></div>
      |</main>
      |<script>
      |'use strict';
      |let creds = null, channels = [];
      |const $ = id => document.getElementById(id);
      |async function api(path, opts) {
      |  opts = opts || {};
      |  opts.headers = Object.assign({}, opts.headers);
      |  if (creds) opts.headers['Authorization'] = 'Basic ' + btoa(creds);
      |  const r = await fetch('/admin/api' + path, opts);
      |  if (r.status === 401) {
      |    const c = prompt('admin credentials (user:password)');
      |    if (c) { creds = c; $('who').textContent = c.split(':')[0];
      |      return api(path, opts); }
      |  }
      |  if (!r.ok) throw new Error(r.status + ' ' + await r.text());
      |  const t = await r.text();
      |  try { return JSON.parse(t); } catch (e) { return t; }
      |}
      |function esc(s){const d=document.createElement('div');
      |  d.textContent=String(s);return d.innerHTML;}
      |async function loadStatus() {
      |  const s = await api('/1.0/server-status/this-server');
      |  $('sid').textContent = s.serverId || 'graft';
      |  const rows = [['channels', s.channelsTotal],
      |    ['config version', s.configVersion ?? ''],
      |    ['store version', s.storeVersion ?? ''],
      |    ['requests', s.totalRequests ?? ''],
      |    ['cache hits', s.responseCacheHits ?? ''],
      |    ['errors', s.errors ?? '']];
      |  $('status').innerHTML = rows.map(r =>
      |    '<div>' + esc(r[0]) + '<b>' + esc(r[1] ?? '') + '</b></div>').join('');
      |}
      |// DOM-built like renderChannels: registry data (ids, names,
      |// urls) never becomes HTML or JS source text
      |async function loadFleet() {
      |  const fleet = await api('/1.0/cluster-status');
      |  const tb = $('fleet').tBodies[0];
      |  tb.textContent = '';
      |  fleet.forEach(s => {
      |    const tr = document.createElement('tr');
      |    const td = v => { const t = document.createElement('td');
      |      t.textContent = v; tr.appendChild(t); return t; };
      |    td(s.serverId + (s.thisServer ? ' (this)' : ''));
      |    td(s.serverName || '');
      |    td(s.url || '');
      |    const st = td('');
      |    const pill = document.createElement('span');
      |    pill.className = 'pill ' + (s.online ? 'on' : 'off');
      |    pill.textContent = s.online ? 'online' : 'offline';
      |    st.appendChild(pill);
      |    td(s.renewedAt ? new Date(s.renewedAt).toISOString() : '');
      |    tb.appendChild(tr);
      |  });
      |}
      |async function loadAll() {
      |  channels = (await api('/1.0/channels/all')).channels || [];
      |  $('xml').href = '/admin/api/1.0/channels/by-server/graft/export';
      |  renderChannels();
      |}
      |// Rows and buttons are built with DOM APIs, with listeners closing
      |// over the RAW channel name — never by splicing data into HTML or
      |// JS source text, so a channel named  x');fetch(...);('  is just a
      |// string (stored-XSS-safe by construction, no escaping to get wrong).
      |function renderChannels() {
      |  const f = $('filter').value.toLowerCase();
      |  const tb = $('chans').tBodies[0];
      |  tb.textContent = '';
      |  channels
      |    .filter(c => !f || c.channelName.toLowerCase().includes(f))
      |    .forEach(c => {
      |      const tr = document.createElement('tr');
      |      const td = v => { const t = document.createElement('td');
      |        t.textContent = v; tr.appendChild(t); return t; };
      |      td(c.channelName);
      |      td(c.channelDataId || '');
      |      td(c.controlSystemType || '');
      |      const st = td('');
      |      const pill = document.createElement('span');
      |      pill.className = 'pill ' + (c.enabled ? 'on' : 'off');
      |      pill.textContent = c.enabled ? 'enabled' : 'disabled';
      |      st.appendChild(pill);
      |      td(Object.keys(c.decimationLevelToRetentionPeriod || {})
      |        .join(', '));
      |      tr.addEventListener('click', () => detail(c.channelName));
      |      tb.appendChild(tr);
      |    });
      |}
      |async function detail(name) {
      |  const c = await api('/1.0/channels/all/by-name/' +
      |    encodeURIComponent(name));
      |  $('dt').style.display = '';
      |  const d = $('detail');
      |  d.textContent = '';
      |  const btn = (label, fn, cls) => {
      |    const b = document.createElement('button');
      |    if (cls) b.className = cls;
      |    b.textContent = label;
      |    b.addEventListener('click', fn);
      |    d.appendChild(b);
      |    d.appendChild(document.createTextNode(' '));
      |  };
      |  btn(c.enabled ? 'disable' : 'enable',
      |    ev => cmd(name, ev.target.textContent));
      |  btn('rename', () => renameCh(name));
      |  btn('remove', () => removeCh(name), 'warn');
      |  const pre = document.createElement('pre');
      |  pre.textContent = JSON.stringify(c, null, 2);
      |  d.appendChild(pre);
      |  $('dt').scrollIntoView();
      |}
      |async function commands(list) {
      |  const r = await api('/1.0/run-archive-configuration-commands', {
      |    method: 'POST', body: JSON.stringify({commands: list})});
      |  const bad = (r.results || []).filter(x => !x.success);
      |  $('msg').textContent = bad.length
      |    ? 'failed: ' + JSON.stringify(bad) : '';
      |  await loadAll();
      |}
      |function cmd(name, action) {
      |  commands([{commandType: 'update_channel', channelName: name,
      |      enabled: action === 'enable'}])
      |    .then(() => detail(name));
      |}
      |function renameCh(name) {
      |  const to = prompt('new name for ' + name);
      |  if (to) commands([{commandType: 'rename_channel',
      |    oldChannelName: name, newChannelName: to}]);
      |}
      |function removeCh(name) {
      |  if (confirm('remove ' + name + '?'))
      |    commands([{commandType: 'remove_channel', channelName: name}]);
      |}
      |function addChannel(ev) {
      |  ev.preventDefault();
      |  commands([{commandType: 'add_channel', channelName: $('an').value,
      |    controlSystemType: $('at').value || 'ca'}]);
      |  $('an').value = '';
      |  return false;
      |}
      |async function importXml() {
      |  const f = $('imp').files[0];
      |  if (!f) return;
      |  const body = await f.text();
      |  await api('/1.0/channels/by-server/graft/import',
      |    {method: 'POST', body});
      |  await loadAll();
      |}
      |loadStatus().catch(e => $('msg').textContent = e);
      |loadFleet().catch(e => $('msg').textContent = e);
      |loadAll().catch(e => $('msg').textContent = e);
      |</script></body></html>
      |""".stripMargin
}
