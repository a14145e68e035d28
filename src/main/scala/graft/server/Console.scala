package graft.server

/** Embedded single-page query console — the engine-side analog of the
  * reference's web GUI (reference webgui/, server.go:91-106): a query
  * box driving POST /query/, live progress pushed over the websocket
  * channel (1 Hz frames; falls back to polling GET /progress/ when the
  * socket is unavailable), stop, websocket password prompts, a file
  * browser over GET /files/, and query history with arrows restored
  * across page reloads from the server-side session state
  * (GET/POST /info/ — reference index.js getState/setState,
  * topbar.js historyArrows). Result grids sort client-side by
  * clicking a column header (numeric-aware, toggling direction — the
  * reference GUI's grid sort, SURVEY §2.7 O4), and a `?` toggle shows
  * a dialect cheatsheet (reference help.js). One static page, no
  * build step, no framework.
  */
object Console {
  val html: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft console</title>
      |<style>
      | body{font-family:ui-monospace,Menlo,Consolas,monospace;margin:0;display:flex;height:100vh}
      | #side{width:280px;min-width:200px;overflow:auto;border-right:1px solid #ccc;padding:8px;font-size:12px}
      | #main{flex:1;display:flex;flex-direction:column;padding:8px;overflow:hidden}
      | textarea{width:100%;height:110px;font:inherit;box-sizing:border-box}
      | #bar{height:6px;background:#eee;margin:6px 0}
      | #fill{height:100%;width:0;background:#4a8}
      | #out{flex:1;overflow:auto}
      | table{border-collapse:collapse;margin:8px 0;font-size:12px}
      | td,th{border:1px solid #bbb;padding:2px 6px;text-align:left}
      | th{background:#f3f3f3;cursor:pointer;user-select:none}
      | .dir{color:#26c;cursor:pointer}.file{color:#282;cursor:pointer}
      | .err{color:#b00;white-space:pre-wrap}
      | button{margin-right:6px}
      |</style></head><body>
      |<div id="side"><b>files</b> <span id="path"></span><div id="tree"></div></div>
      |<div id="main">
      | <textarea id="q" placeholder="select * from lineitem.parquet where l_quantity &gt; 45"></textarea>
      | <div>
      |  <button onclick="histGo(-1)" title="previous query">&#9664;</button>
      |  <button onclick="histGo(1)" title="next query">&#9654;</button>
      |  <button onclick="run()">run</button>
      |  <button onclick="plan()" title="show the physical query plan without running">plan</button>
      |  <button onclick="fetch('/stop/',{method:'POST'})">stop</button>
      |  <button onclick="toggleHelp()" title="query language help">?</button>
      |  save to <input id="save" size="28" placeholder="(optional) /path/out.csv">
      |  <span id="status"></span>
      | </div>
      | <div id="bar"><div id="fill"></div></div>
      | <div id="help" style="display:none;overflow:auto;max-height:45%;border:1px solid #ccc;padding:8px;font-size:12px">
      |  <b>Query shape</b>: <code>select &lt;expressions&gt; from &lt;file&gt; &lt;joins&gt; where &lt;predicates&gt; group by &lt;exprs&gt; having &lt;predicate&gt; order by &lt;expr&gt; [asc]</code>.
      |  Multiple statements separated by <code>;</code>. <code>top N</code> after select (or <code>limit N</code> at the end) caps rows; <code>distinct</code> keeps the first row per value in scan order.<br><br>
      |  <b>Files</b>: double-click a file in the browser to add its path to the query; csv, parquet, json, orc and xml all work in <code>from</code>.
      |  Add <code>nh</code>/<code>noheader</code> after a csv path that has no header row. Columns are referenced by name or <code>cN</code> number.<br><br>
      |  <b>Predicates</b>: <code>= != &lt;&gt; &lt; &lt;= &gt; &gt;=</code>, <code>like</code> (case-insensitive), <code>in (...)</code>, <code>between a and b</code>, combined with <code>and or xor not</code> and parentheses.<br><br>
      |  <b>Aggregates</b>: <code>sum avg min max count stdev stdevp</code>, each with optional <code>distinct</code>; bare columns next to aggregates take the group's last value in scan order.<br><br>
      |  <b>Functions</b>: <code>year month week day dayname monthname dayofyear dayofmonth hour</code> on dates; <code>abs coalesce inc([step]) format encrypt(x,pass) decrypt(x,pass)</code>;
      |  pipeline extras <code>session(ts, '30 minutes', user)</code> (per-key session number), <code>token_count(text)</code>, <code>compress_ratio(text)</code>, <code>minhash_sig(text)</code> (MinHash signature string), <code>simhash(text)</code>, <code>fingerprint(text)</code>, <code>lang_id(text)</code>, <code>pii_redact(text)</code>.
      |  Dates add durations: <code>birthdate + '3 weeks'</code>; <code>case</code> expressions (searched and simple) work as in SQL.<br><br>
      |  <b>Dedup</b>: <code>dedup near id, text from file</code> emits MinHash-LSH candidate pairs (doc_a, doc_b); add <code>threshold 0.5</code> to verify candidates with exact n-gram Jaccard and keep jac &ge; t; <code>dedup exact id, text from file</code> groups exact copies (md5) with the kept id and copy count; <code>dedup best id, text from file</code> keeps each near-dup cluster's highest-QUALITY doc; <code>dedup semantic id, vec from file threshold 0.2</code> is SemDeDup over an embedding column (k-means cells, within-cell cosine domination).<br><br>
      |  <b>Similarity</b>: <code>similar id, vec from file top 5</code> — approximate-nearest-neighbor top-k over a vector column (banded LSH + cosine verification), emitting (q_id, n_id, sim, rank).<br><br>
      |  <b>Layout</b>: <code>shard id from file into 16</code> — deterministic training-shard addressing (doc_id, shard, pos); <code>interleave id, src from file</code> — round-robin source mixing order (doc_id, source, pos, rank).<br><br>
      |  <b>Curation</b>: <code>search id, text from file for 'terms' top 20</code> (BM25); <code>split id from file into 80 10 10</code> (train/val/test); <code>sample id from file pct 10</code> or <code>sample id from file top 100 by weight</code> (deterministic plain / weighted draw); <code>cluster id, vec from file into 4</code> (k-means cells); <code>quantize id, vec from file</code> (sign-bit binary codes); <code>chunk id, text from file size 64 overlap 16</code>; <code>pack id, text from file size 512</code>; <code>profile file</code> (per-column stats); <code>trend ts, kind from file top 3</code> (top types per sliding window); <code>card id, text from file</code> (one-row dataset datasheet); <code>mix id, text from file budget 1000000 per src</code> (token-budget source mixing); <code>calibrate id, src, text from file</code> (per-source quality percentiles + keep flag); <code>negatives id, vec, label from file top 5</code> (hard-negative mining); <code>outliers id, vec from file top 20</code> (distance-to-nearest-centroid OOD scoring); <code>drift vec from ref against cur</code> (per-dimension PSI between two snapshots); <code>epochs src, text from file budget 1000000</code> (temperature-weighted per-source pass plan); <code>retention user, ts from file</code> (weekly cohort retention); <code>diff text from old against new</code> (corpus snapshot diff: added/removed/retained volumes); <code>fertility lang, text from file</code> (per-language tokens-per-word); <code>packing id, text from file sizes 256, 512, 1024</code> (sequence-length packing efficiency curve); <code>repair id, vec from file threshold 0.0014</code> (IVF index repair: re-assign only drifted cells' vectors); <code>index id, vec from file into '/path'</code> (build + persist the IVF index as a cell-partitioned parquet layout); <code>serve id, vec from '/path' [query batch] top 5</code> (partition-pruned ANN serving off the persisted index; <code>query</code> serves an external batch routed via the index's cell means); <code>repair id, vec from file using '/path'</code> (repair off the persisted index: dirty cells become a partition predicate, only their files are read).<br><br>
      |  <b>Plan</b>: the plan button shows each statement's physical query plan (pushed filters, broadcasts, shuffles) without running it.<br><br>
      |  <b>Joins</b>: <code>join / left join file alias on a.col = alias.col</code> chains across files; <code>sjoin</code> forces a broadcast (small file), <code>bjoin</code> a sort-merge (both big).<br><br>
      |  <b>Saving</b>: fill the save box before running to also write each statement's FULL result as csv (the grid stays clipped); multiple statements get numbered suffixes.
      |  Click a column header to sort the grid.
      | </div>
      | <div id="out"></div>
      |</div>
      |<script>
      |let timer=null,entries=[],sortState={},ws=null,hist=[],hpos=0;
      |function esc(s){const d=document.createElement('div');d.textContent=s;return d.innerHTML}
      |function render(){
      |  const out=document.getElementById('out');out.innerHTML='';
      |  entries.forEach((e,ei)=>{
      |    let h='<table><tr>'+e.Colnames.map((c,ci)=>
      |      '<th onclick="sortBy('+ei+','+ci+')">'+esc(c)+
      |      (sortState[ei]&&sortState[ei].col===ci?(sortState[ei].asc?' ▲':' ▼'):'')+
      |      '</th>').join('')+'</tr>';
      |    for(const row of e.Vals) h+='<tr>'+row.map(v=>'<td>'+esc(v)+'</td>').join('')+'</tr>';
      |    h+='</table>';
      |    if(e.Clipped) h+='<div>(clipped to '+e.ShowLimit+' rows)</div>';
      |    out.innerHTML+=h;
      |  })}
      |function sortBy(ei,ci){
      |  const s=sortState[ei]||{col:-1,asc:true};
      |  s.asc=s.col===ci?!s.asc:true;s.col=ci;sortState[ei]=s;
      |  entries[ei].Vals.sort((a,b)=>{
      |    const x=a[ci],y=b[ci],nx=parseFloat(x),ny=parseFloat(y);
      |    const c=(!isNaN(nx)&&!isNaN(ny))?nx-ny:(x<y?-1:x>y?1:0);
      |    return s.asc?c:-c});
      |  render()}
      |function toggleHelp(){const h=document.getElementById('help');
      |  h.style.display=h.style.display==='none'?'block':'none'}
      |function applyProgress(p){
      |  document.getElementById('fill').style.width=(p.Percent||0)+'%'}
      |function poll(){fetch('/progress/').then(r=>r.json()).then(applyProgress)}
      |// live push (reference /socket/, server.go:19-88): 1 Hz progress
      |// frames + password prompts; the JDK server side listens on a
      |// sidecar loopback port advertised at GET /socket/. While the
      |// socket is up the run loop never polls.
      |function connectWs(){
      |  fetch('/socket/').then(r=>r.json()).then(d=>{
      |    if(!d.Port||d.Port<0){setTimeout(connectWs,5000);return}
      |    const w=new WebSocket('ws://'+location.hostname+':'+d.Port+'/socket/');
      |    w.onopen=()=>{ws=w};
      |    w.onclose=()=>{ws=null;setTimeout(connectWs,5000)};
      |    w.onmessage=e=>{const m=JSON.parse(e.data);
      |      if(m.Type==='progress')applyProgress(m);
      |      else if(m.Type==='need_password'){
      |        const pw=window.prompt('password:');
      |        if(pw!==null)w.send(JSON.stringify({Type:'password',Password:pw}))}};
      |  }).catch(()=>setTimeout(connectWs,5000))}
      |connectWs();
      |// query history, persisted server-side so a reload restores the
      |// session (reference getState/setState, index.js:31-76)
      |function saveHist(q){
      |  if(q&&(!hist.length||hist[hist.length-1].query!==q))hist.push({query:q});
      |  hpos=hist.length-1;
      |  fetch('/info/?info=setState',{method:'POST',
      |    body:JSON.stringify({haveInfo:true,history:hist})})}
      |function histGo(d){
      |  if(!hist.length)return;
      |  hpos=Math.max(0,Math.min(hist.length-1,hpos+d));
      |  document.getElementById('q').value=hist[hpos].query||''}
      |fetch('/info/?info=getState').then(r=>r.json()).then(d=>{
      |  if(d.history&&d.history.length){
      |    hist=d.history;hpos=hist.length-1;
      |    const q=document.getElementById('q');
      |    if(!q.value)q.value=hist[hpos].query||''}}).catch(()=>{})
      |function run(password){
      |  const q=document.getElementById('q').value;
      |  saveHist(q);
      |  const body={query:q};
      |  const save=document.getElementById('save').value.trim();
      |  if(save){body.savePath=save;body.saveMode='single'}
      |  if(password)body.password=password;
      |  document.getElementById('status').textContent='running…';
      |  if(!ws)timer=setInterval(poll,400);
      |  fetch('/query/',{method:'POST',body:JSON.stringify(body)})
      |  .then(r=>r.json()).then(d=>{
      |    if(timer){clearInterval(timer);timer=null;poll()}
      |    if(d.Status==='need_password'){
      |      const pw=window.prompt('password:');
      |      if(pw!==null){run(pw);return}
      |    }
      |    document.getElementById('status').textContent=d.Status+
      |      (d.SavedPaths&&d.SavedPaths.length?' — saved '+d.SavedPaths.join(', '):'');
      |    if(d.Status!=='ok'){document.getElementById('out').innerHTML=
      |      '<div class="err">'+esc(d.Status)+'</div>';return}
      |    entries=d.Entries;sortState={};render();
      |  }).catch(e=>{if(timer){clearInterval(timer);timer=null}
      |    document.getElementById('status').textContent='error: '+e})}
      |// query-plan view: POST /explain/ compiles the statements and
      |// returns Catalyst's formatted physical plan WITHOUT executing —
      |// pushed filters, broadcast sides and exchanges are inspectable
      |// before a query touches real data
      |function plan(){
      |  const q=document.getElementById('q').value;
      |  saveHist(q);
      |  document.getElementById('status').textContent='planning…';
      |  fetch('/explain/',{method:'POST',body:JSON.stringify({query:q})})
      |  .then(r=>r.json()).then(d=>{
      |    document.getElementById('status').textContent=d.Status;
      |    if(d.Status!=='ok'){document.getElementById('out').innerHTML=
      |      '<div class="err">'+esc(d.Status)+'</div>';return}
      |    document.getElementById('out').innerHTML=d.Plans.map(p=>
      |      '<div><b>'+esc(p.Query)+'</b><pre style="white-space:pre-wrap;'+
      |      'border:1px solid #ccc;padding:6px;font-size:11px">'+
      |      esc(p.Plan)+'</pre></div>').join('');
      |  }).catch(e=>{document.getElementById('status').textContent='error: '+e})}
      |function ls(dir){
      |  fetch('/files/?dir='+encodeURIComponent(dir||'')).then(r=>r.json()).then(d=>{
      |    if(d.Status!=='ok')return;
      |    document.getElementById('path').textContent=d.Path;
      |    const t=document.getElementById('tree');t.innerHTML='';
      |    const up=document.createElement('div');up.className='dir';up.textContent='..';
      |    up.onclick=()=>ls(d.Parent);t.appendChild(up);
      |    for(const x of d.Dirs){const e=document.createElement('div');e.className='dir';
      |      e.textContent=x.split('/').pop()+'/';e.onclick=()=>ls(x);t.appendChild(e)}
      |    for(const x of d.Files){const e=document.createElement('div');e.className='file';
      |      e.textContent=x.split('/').pop();
      |      e.onclick=()=>{const q=document.getElementById('q');q.value+=(q.value?' ':'')+x};
      |      t.appendChild(e)}
      |  })}
      |ls('');
      |// heartbeat while the socket is down: an open console tab still
      |// counts as a connected client for the server's idle auto-exit
      |// (120s); with the socket up the connection itself is the signal
      |setInterval(()=>{if(!ws)fetch('/progress/')},30000);
      |</script></body></html>
      |""".stripMargin
}
