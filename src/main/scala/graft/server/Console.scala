package graft.server

/** Embedded single-page query console — the engine-side analog of the
  * reference's web GUI (reference webgui/, server.go:91-106): a query
  * box driving POST /query/, live progress from GET /progress/, stop,
  * and a file browser over GET /files/. Result grids sort client-side
  * by clicking a column header (numeric-aware, toggling direction —
  * the reference GUI's grid sort, SURVEY §2.7 O4). One static page,
  * no build step, no framework.
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
      |  <button onclick="run()">run</button>
      |  <button onclick="fetch('/stop/',{method:'POST'})">stop</button>
      |  save to <input id="save" size="28" placeholder="(optional) /path/out.csv">
      |  <span id="status"></span>
      | </div>
      | <div id="bar"><div id="fill"></div></div>
      | <div id="out"></div>
      |</div>
      |<script>
      |let timer=null,entries=[],sortState={};
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
      |function poll(){fetch('/progress/').then(r=>r.json()).then(p=>{
      |  document.getElementById('fill').style.width=(p.Percent||0)+'%';})}
      |function run(password){
      |  const q=document.getElementById('q').value;
      |  const body={query:q};
      |  const save=document.getElementById('save').value.trim();
      |  if(save){body.savePath=save;body.saveMode='single'}
      |  if(password)body.password=password;
      |  document.getElementById('status').textContent='running…';
      |  timer=setInterval(poll,400);
      |  fetch('/query/',{method:'POST',body:JSON.stringify(body)})
      |  .then(r=>r.json()).then(d=>{
      |    clearInterval(timer);poll();
      |    if(d.Status==='need_password'){
      |      const pw=window.prompt('password:');
      |      if(pw!==null){run(pw);return}
      |    }
      |    document.getElementById('status').textContent=d.Status+
      |      (d.SavedPaths&&d.SavedPaths.length?' — saved '+d.SavedPaths.join(', '):'');
      |    if(d.Status!=='ok'){document.getElementById('out').innerHTML=
      |      '<div class="err">'+esc(d.Status)+'</div>';return}
      |    entries=d.Entries;sortState={};render();
      |  }).catch(e=>{clearInterval(timer);
      |    document.getElementById('status').textContent='error: '+e})}
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
      |// heartbeat: an open console tab counts as a connected client,
      |// so the server's idle auto-exit (120s) doesn't fire under it —
      |// the polling analog of the reference's websocket client count
      |setInterval(()=>fetch('/progress/'),30000);
      |</script></body></html>
      |""".stripMargin
}
