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

INDEX_HTML = """<!doctype html><html><head><meta charset=utf-8>
<title>Yume TPU</title><style>body{font-family:sans-serif;max-width:720px;
margin:2em auto}button{margin:2px}video{max-width:100%}</style></head><body>
<h2>Yume TPU — interactive world generation</h2>
<p>keys: <select id=keys><option>W</option><option>A</option><option>S</option>
<option>D</option><option>W+A</option><option>W+D</option><option>S+A</option>
<option>S+D</option><option>None</option></select>
mouse: <select id=mouse><option>·</option><option>→</option><option>←</option>
<option>↑</option><option>↓</option><option>↑→</option><option>↑←</option>
<option>↓→</option><option>↓←</option></select>
<button onclick="gen()">Generate</button>
<button onclick="fetch('/api/load',{method:'POST',body:'{}'})">Load model</button></p>
<pre id=status></pre><div id=out></div>
<script>
async function gen(){
 await fetch('/api/generate_long',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({keys:document.getElementById('keys').value,
                       mouse:document.getElementById('mouse').value,
                       mode:'continue_from_last'})});
 poll();}
async function poll(){
 let r=await fetch('/api/status'); let j=await r.json();
 document.getElementById('status').textContent=JSON.stringify(j,null,1);
 if(j.status=='generating'){setTimeout(poll,1000);}
 else if(j.outputs.length){document.getElementById('out').innerHTML=
  '<video controls autoplay src="/video/'+j.outputs.length-1+'"></video>';}}
poll();
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
    STATE["tokenizer"] = Tokenizer(args.tokenizer, seq_len=cfg.t5.text_len,
                                   vocab_size=cfg.t5.vocab_size)
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
        latents = pipe.generate_segment(latents, ctx, steps=steps,
                                        seed=seed + s_idx,
                                        progress_cb=on_step)
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
