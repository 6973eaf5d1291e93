"""Interactive world-generation web server.

TPU-native equivalent of the reference single-GPU Flask webapp
(webapp_single_gpu.py): REST endpoints /api/load, /api/generate_long,
/api/status, /api/log/tail (reference :1374-1476), I2V / T2V /
continue-from-last modes with session state (reference `LAST`, :872-876),
keyboard/mouse control vocabulary injection (:648-677), and width-tiled VAE
decode (:370-551 → pipelines/tiled_decode.py). Built on the stdlib
http.server (Flask is not vendored here); generation runs on a worker
thread with a job-status poller, like the reference's async generate.

    python -m yume_tpu.serving.webapp --smoke --port 7860
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import os
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

LOG_PATH = "/tmp/yume_webapp.log"
logging.basicConfig(filename=LOG_PATH, level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("yume")

STATE = {
    "pipe": None,
    "cfg": None,
    "tokenizer": None,
    "status": "idle",
    "progress": "",
    "last": None,       # session state: latents of the last generation
    "outputs": [],
    "lock": threading.Lock(),
}

# Bilingual (EN/中文) single-page UI over the REST endpoints — the
# feature-parity counterpart of the reference's embedded HTML/JS app
# (webapp_single_gpu.py:888-1373: mode select, image upload, prompt +
# refine, camera vocab, per-step progress, log tail, video gallery).
INDEX_HTML = """<!doctype html><html><head><meta charset=utf-8>
<title>Yume TPU</title><style>
body{font-family:sans-serif;max-width:860px;margin:1.5em auto;padding:0 1em}
fieldset{border:1px solid #ccc;border-radius:6px;margin:.6em 0}
button{margin:2px;padding:.35em .9em}video{max-width:100%;margin:.4em 0}
textarea{width:100%;box-sizing:border-box}label{margin-right:.8em}
#bar{height:10px;background:#eee;border-radius:5px;overflow:hidden}
#fill{height:100%;width:0;background:#4a7;transition:width .3s}
#log{background:#111;color:#9e9;padding:.5em;font-size:11px;max-height:160px;
overflow:auto;white-space:pre-wrap}.muted{color:#777;font-size:12px}
</style></head><body>
<div style="float:right"><button onclick="setLang('en')">EN</button>
<button onclick="setLang('zh')">中文</button></div>
<h2 data-i18n=title></h2>
<fieldset><legend data-i18n=model></legend>
<button onclick="loadModel()" data-i18n=load></button>
<span id=loadstate class=muted></span></fieldset>
<fieldset><legend data-i18n=controls></legend>
<label data-i18n=mode></label><select id=mode>
<option value=t2v data-i18n=m_t2v></option>
<option value=i2v data-i18n=m_i2v></option>
<option value=continue_from_last data-i18n=m_cont></option></select>
<label data-i18n=keys></label><select id=keys><option>W</option><option>A</option>
<option>S</option><option>D</option><option>W+A</option><option>W+D</option>
<option>S+A</option><option>S+D</option><option>None</option></select>
<label data-i18n=mouse></label><select id=mouse><option>·</option><option>→</option>
<option>←</option><option>↑</option><option>↓</option><option>↑→</option>
<option>↑←</option><option>↓→</option><option>↓←</option></select>
<label data-i18n=steps></label><input id=steps type=number value=4 min=1 max=50
 style="width:4em">
<label data-i18n=segments></label><input id=segments type=number value=1 min=1
 max=8 style="width:4em">
<label>seed</label><input id=seed type=number value=0 style="width:6em">
</fieldset>
<fieldset><legend data-i18n=prompt></legend>
<textarea id=prompt rows=3></textarea>
<input id=img type=file accept="image/*">
<button onclick="refine()" data-i18n=refine></button>
<label><input id=autorefine type=checkbox> <span data-i18n=autorefine></span></label>
</fieldset>
<p><button onclick="gen()" style="font-size:1.1em" data-i18n=generate></button>
<span id=prog class=muted></span></p>
<div id=bar><div id=fill></div></div>
<div id=out></div>
<details><summary data-i18n=logs></summary><div id=log></div></details>
<script>
const I18N={en:{title:'Yume TPU — interactive world generation',
 model:'Model',load:'Load model',controls:'Camera / sampling controls',
 mode:'mode:',m_t2v:'text → video',m_i2v:'image → video',
 m_cont:'continue last',keys:'keys:',mouse:'mouse:',steps:'steps:',
 segments:'segments:',prompt:'Prompt',refine:'Refine prompt',
 autorefine:'refine before generating',generate:'Generate',logs:'Server log'},
zh:{title:'Yume TPU — 交互式世界生成',model:'模型',load:'加载模型',
 controls:'相机 / 采样控制',mode:'模式：',m_t2v:'文生视频',
 m_i2v:'图生视频',m_cont:'继续上一段',keys:'按键：',mouse:'鼠标：',
 steps:'步数：',segments:'段数：',prompt:'提示词',refine:'润色提示词',
 autorefine:'生成前自动润色',generate:'开始生成',logs:'服务器日志'}};
function setLang(l){localStorage.lang=l;
 document.querySelectorAll('[data-i18n]').forEach(e=>{
  e.textContent=I18N[l][e.dataset.i18n]||e.textContent;});}
async function imgB64(){const f=document.getElementById('img').files[0];
 if(!f)return null;const b=await f.arrayBuffer();
 return btoa(String.fromCharCode(...new Uint8Array(b)));}
async function loadModel(){document.getElementById('loadstate').textContent='...';
 await fetch('/api/load',{method:'POST',body:'{}'});
 document.getElementById('loadstate').textContent='ok';}
async function refine(){const body={prompt:document.getElementById('prompt').value,
 image_b64:await imgB64()};
 const r=await fetch('/api/refine_prompt',{method:'POST',
  headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
 const j=await r.json();
 if(j.prompt)document.getElementById('prompt').value=j.prompt;}
async function gen(){
 const body={mode:document.getElementById('mode').value,
  keys:document.getElementById('keys').value,
  mouse:document.getElementById('mouse').value,
  prompt:document.getElementById('prompt').value||undefined,
  steps:+document.getElementById('steps').value,
  segments:+document.getElementById('segments').value,
  seed:+document.getElementById('seed').value,
  refine_prompt:document.getElementById('autorefine').checked||undefined,
  image_b64:await imgB64()};
 await fetch('/api/generate_long',{method:'POST',
  headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
 poll();}
async function poll(){
 const r=await fetch('/api/status');const j=await r.json();
 document.getElementById('prog').textContent=j.progress||j.status;
 const s=j.step||{};const pct=s.n?Math.round(100*((s.segment||0)*s.n+s.i)/
  ((s.segments||1)*s.n)):0;
 document.getElementById('fill').style.width=pct+'%';
 try{const lr=await fetch('/api/log/tail?n=30');const lj=await lr.json();
  document.getElementById('log').textContent=(lj.lines||[]).join('\\n');}catch(e){}
 if(j.status=='generating'){setTimeout(poll,1000);}
 else if(j.outputs&&j.outputs.length){
  document.getElementById('out').innerHTML=j.outputs.map((_,i)=>
   '<video controls src="/video/'+i+'"></video>').reverse().join('');}}
setLang(localStorage.lang||'en');poll();
</script></body></html>"""


def load_models(args):
    import jax

    from ..utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from ..configs import CONFIGS
    from ..data.tokenizer import Tokenizer
    from ..pipelines.ti2v import TI2VPipeline
    from ..sample import load_pipeline

    cfg, pipe = load_pipeline(args)
    if getattr(args, "sp", 1) > 1:
        from ..parallel.mesh import make_mesh, make_usp_mesh

        if args.sp_kind == "usp":
            pipe.mesh = make_usp_mesh(data=1, fsdp=1, sp_u=2,
                                      sp_r=args.sp // 2,
                                      devices=jax.devices()[: args.sp])
        else:
            pipe.mesh = make_mesh(data=1, fsdp=1, sp=args.sp,
                                  devices=jax.devices()[: args.sp])
        pipe.sp_kind = args.sp_kind
    if getattr(args, "pp", 0) > 1:
        pipe.parallelize_pp(args.pp)
    if getattr(args, "quant", "none") != "none":
        STATE["quant_bits"] = {"int8": 8, "int4": 4}[args.quant]
    if getattr(args, "memory_optimization", False):
        # CPU⇄HBM shuttle ≙ the reference webapp's memory_optimization
        # (webapp_single_gpu.py:601-608, 819-852): T5 and VAE live in host
        # RAM and visit the device only for their phase; the DiT stays
        # resident
        from ..utils.offload import OffloadSlot

        slot = OffloadSlot()
        if pipe.t5_params is not None:
            slot.register("t5", pipe.t5_params)
            pipe.t5_params = None
        slot.register("vae", pipe.vae_params)
        pipe.vae_params = None
        STATE["offload"] = slot
    STATE["pipe"] = pipe
    STATE["cfg"] = cfg
    from ..data.tokenizer import resolve_tokenizer_path

    STATE["tokenizer"] = Tokenizer(
        resolve_tokenizer_path(args.tokenizer, args.ckpt_dir),
        seq_len=cfg.t5.text_len, vocab_size=cfg.t5.vocab_size,
        warn_fallback=not args.smoke)
    if getattr(args, "refiner_model", None):
        from ..data.prompt_refine import get_refiner

        STATE["refiner"] = get_refiner(args.refiner_model)
    STATE["status"] = "loaded"
    log.info("models loaded (%s, smoke=%s)", args.config, args.smoke)


def _phase(name):
    """Bring one offloaded model onto the device for its phase (no-op when
    memory_optimization is off)."""
    slot = STATE.get("offload")
    pipe = STATE["pipe"]
    if slot is None:
        return
    if name == "t5" and "t5" in slot:
        pipe.t5_params = slot.use("t5")
        pipe.vae_params = None
    elif name == "vae":
        pipe.vae_params = slot.use("vae")
        pipe.t5_params = None
    elif name == "dit":
        pipe.t5_params = None
        pipe.vae_params = None


def refine_prompt(prompt, image=None):
    """Refine via the configured model, or the template fallback (reference
    refine_prompt_from_image, webapp_single_gpu.py:286-341)."""
    from ..data.prompt_refine import TemplateRefiner

    refiner = STATE.get("refiner") or TemplateRefiner()
    try:
        return refiner(prompt, image)
    except Exception as e:
        log.error("refine failed: %s", e)
        return prompt


def _generate(req, args):
    import jax.numpy as jnp

    from ..data.controls import control_caption
    from ..utils.video import load_image, save_video

    pipe, cfg, tok = STATE["pipe"], STATE["cfg"], STATE["tokenizer"]
    mode = req.get("mode", "t2v")
    keys = req.get("keys", "W")
    mouse = req.get("mouse", "·")
    prompt = req.get("prompt") or control_caption(keys, mouse)
    steps = int(req.get("steps", 2 if args.smoke else 4))
    seed = int(req.get("seed", int(time.time()) % 100000))
    # number of autoregressive continuation segments in this request
    # (reference long_generate's per-segment loop, webapp_single_gpu.py:763)
    segments = max(1, int(req.get("segments", 1)))

    STATE["status"] = "generating"
    STATE["step"] = {"i": 0, "n": steps, "segment": 0, "segments": segments}
    STATE["progress"] = f"mode={mode} prompt={prompt[:60]}"
    t0 = time.time()

    img = None
    if req.get("image_b64"):
        raw = base64.b64decode(req["image_b64"])
        tmp = "/tmp/yume_upload.png"
        open(tmp, "wb").write(raw)
        size = (32, 32) if args.smoke else (args.height, args.width)
        img = load_image(tmp, size=size)
    if req.get("refine_prompt"):
        prompt = refine_prompt(prompt, img)
        STATE["progress"] = f"refined: {prompt[:60]}"

    _phase("t5")
    ids, mask = tok([prompt])
    ctx = pipe.encode_text(jnp.asarray(ids), jnp.asarray(mask))

    def on_step(sigma):
        STATE["step"]["i"] += 1
        s = STATE["step"]
        STATE["progress"] = (f"segment {s['segment'] + 1}/{s['segments']} "
                             f"step {s['i']}/{s['n']} σ={float(sigma):.3f}")

    if STATE.get("quant_bits") and not isinstance(pipe.dit_params, tuple):
        # every webapp mode runs on the quantized trunk (packed segments and
        # unpacked euler t2v both supported by models/quantized.py)
        pipe.quantize_int8(bits=STATE["quant_bits"])

    def decode(tail):
        _phase("vae")
        # width-tiled decode bounds memory at 720p+ (reference
        # tiled_decode_overlap, webapp_single_gpu.py:370-551)
        return (pipe.decode_tiled(tail) if tail.shape[3] >= 40
                else pipe._decode(tail))

    videos = []
    if mode == "continue_from_last" and STATE["last"] is not None:
        latents = STATE["last"]
    elif mode == "i2v" and img is not None:
        _phase("vae")
        frames = jnp.asarray(np.repeat(img[None], 16, 0))[None]
        frame_num = 5 if args.smoke else cfg.frame_num
        z, _ = pipe.encode_image_conditioning(frames, frame_num)
        latents = z[:, : -cfg.latent_frame_zero]
    else:  # t2v first segment
        size = (32, 32) if args.smoke else (args.width, args.height)
        frame_num = 5 if args.smoke else cfg.frame_num
        _phase("dit")
        latents = pipe.generate_t2v(ctx, size=size, frame_num=frame_num,
                                    steps=steps, seed=seed,
                                    return_latents=True)
        STATE["step"]["i"] = steps
        videos.append(decode(latents))
        segments -= 1
        STATE["step"]["segment"] += 1

    for s_idx in range(segments):
        _phase("dit")
        STATE["step"]["i"] = 0
        latents = pipe.generate_segment(
            latents, ctx, steps=steps, seed=seed + s_idx,
            sampler="teacache" if args.teacache else "euler",
            teacache_interval=args.teacache_interval,
            teacache_threshold=args.teacache_threshold,
            progress_cb=None if args.teacache else on_step)
        if args.teacache:
            # the cached sampler has no per-step callback; report coarse
            # per-segment progress so the UI doesn't appear stalled
            STATE["step"]["i"] = steps
            STATE["progress"] = (f"segment {STATE['step']['segment'] + 1}: "
                                 f"denoise done, decoding")
        videos.append(decode(latents[:, -cfg.latent_frame_zero:]))
        STATE["step"]["segment"] += 1

    STATE["last"] = latents
    outs = []
    for video in videos:
        out = os.path.join(args.output_dir,
                           f"web_{len(STATE['outputs']):04d}.mp4")
        save_video(np.asarray(video[0]), out, fps=cfg.sample_fps)
        STATE["outputs"].append(out)
        outs.append(out)
    STATE["status"] = "done"
    STATE["progress"] = f"{time.time() - t0:.1f}s → {', '.join(outs)}"
    log.info("generated %s in %.1fs", outs, time.time() - t0)


class Handler(BaseHTTPRequestHandler):
    args = None  # set by serve()

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *a):
        log.info("http " + fmt, *a)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = INDEX_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/api/status":
            self._json({
                "status": STATE["status"],
                "progress": STATE["progress"],
                "step": STATE.get("step"),
                "outputs": STATE["outputs"],
                "has_session": STATE["last"] is not None,
            })
        elif self.path.startswith("/api/log/tail"):
            try:
                lines = open(LOG_PATH).readlines()[-50:]
            except FileNotFoundError:
                lines = []
            self._json({"lines": lines})
        elif self.path.startswith("/video/"):
            try:
                idx = int(self.path.split("/")[-1])
                data = open(STATE["outputs"][idx], "rb").read()
                self.send_response(200)
                self.send_header("Content-Type", "video/mp4")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception:
                self._json({"error": "not found"}, 404)
        else:
            self._json({"error": "unknown endpoint"}, 404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        try:
            req = json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError:
            return self._json({"error": "bad json"}, 400)

        if self.path == "/api/load":
            if STATE["pipe"] is None:
                load_models(self.args)
            self._json({"status": STATE["status"]})
        elif self.path == "/api/generate_long":
            if STATE["pipe"] is None:
                return self._json({"error": "model not loaded — POST /api/load"}, 409)
            if not STATE["lock"].acquire(blocking=False):
                return self._json({"error": "busy"}, 429)

            def work():
                try:
                    _generate(req, self.args)
                except Exception as e:
                    STATE["status"] = "error"
                    STATE["progress"] = str(e)
                    log.error("generate failed: %s\n%s", e, traceback.format_exc())
                finally:
                    STATE["lock"].release()

            threading.Thread(target=work, daemon=True).start()
            self._json({"status": "started"})
        elif self.path == "/api/refine_prompt":
            # ≙ reference /api/refine_prompt → refine_prompt_from_image
            # (webapp_single_gpu.py:286-341, 1432-1445)
            img = None
            if req.get("image_b64"):
                from ..utils.video import load_image

                raw = base64.b64decode(req["image_b64"])
                tmp = "/tmp/yume_refine.png"
                open(tmp, "wb").write(raw)
                img = load_image(tmp)
            prompt = req.get("prompt", "")
            self._json({"prompt": refine_prompt(prompt, img)})
        else:
            self._json({"error": "unknown endpoint"}, 404)


def build_argparser():
    p = argparse.ArgumentParser(description="yume_tpu web server")
    p.add_argument("--config", default="ti2v-5B")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--output_dir", default="/tmp/yume_web")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=704)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int4"],
                   help="quantize the DiT trunk after the first t2v segment "
                        "(continuation segments only; halves/quarters weight "
                        "HBM like the reference webapp's memory_optimization, "
                        "webapp_single_gpu.py:819-852)")
    p.add_argument("--memory_optimization", action="store_true",
                   help="host-offload T5/VAE between phases (≙ reference "
                        "webapp CPU⇄GPU shuttling, webapp_single_gpu.py:"
                        "601-608,819-852)")
    p.add_argument("--refiner_model", default=None,
                   help="local InternVL-style model dir for /api/refine_prompt")
    p.add_argument("--seed", type=int, default=0)
    # multi-chip serving (same semantics as the sample CLI)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree for segment denoising")
    p.add_argument("--sp_kind", default="ulysses",
                   choices=["ulysses", "ring", "usp"])
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel stages for the bf16 trunk")
    p.add_argument("--w8a8", action="store_true",
                   help="int8 MXU matmuls for the big block matmuls")
    p.add_argument("--teacache", action="store_true",
                   help="block-residual caching between denoise steps "
                        "(the bench.py best-serving config)")
    p.add_argument("--teacache_interval", type=int, default=3,
                   help="with --teacache: full DiT every N-th step")
    p.add_argument("--teacache_threshold", type=float, default=None,
                   help="with --teacache: adaptive rel-L1 refresh threshold "
                        "(0.1 = the quality-anchored best-serving config; "
                        "overrides --teacache_interval)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    Handler.args = args
    if args.preload:
        load_models(args)
    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"yume_tpu webapp on http://{args.host}:{args.port} (log: {LOG_PATH})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
