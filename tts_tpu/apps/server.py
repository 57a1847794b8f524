"""tts-server: OpenAI-compatible speech REST API.

Endpoint parity with /root/reference/examples/server/server.cpp:
  POST /v1/audio/speech            {input, model?, voice?, temperature?,
                                    top_k?, top_p?, repetition_penalty?,
                                    response_format? (wav|wave|aiff)}
  POST /v1/audio/conditional-prompt {prompt, text_encoder_path}
  GET  /v1/models                  OpenAI-style model list
  GET  /v1/audio/voices            {model: [voices...]}
  GET  /health                     {"status":"ok"}
  GET  /                           minimal index page

Architecture: a task queue feeding a worker pool of runner replicas
(--n-parallelism, server.cpp:225-321).  On TPU one process drives one chip, so
replicas share device weights; request-level parallelism still overlaps host
text processing with device compute.  --model-path may be a directory of GGUF
files for multi-model serving.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tts_tpu.apps.web_ui import INDEX_HTML
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig, TTSError
from tts_tpu.utils.audio import encode_aiff, encode_wav


def error_json(message: str, etype: str = "invalid_request_error", code: int = 400):
    return code, {"error": {"message": message, "type": etype, "code": code}}


class ServerState:
    """Task queue + worker pool.

    All workers share ONE runner per model (weights live once in device HBM —
    on a single chip, replicas would only multiply memory, not throughput);
    a per-runner lock serializes generation on a runner (its KV cache and
    jit-donation story are single-flight), while different models can run
    concurrently and host-side JSON/WAV work overlaps device compute.
    """

    def __init__(self, model_paths: dict[str, str], default_config: GenerationConfig,
                 n_parallelism: int = 1, request_timeout: float = 1800.0,
                 data_parallel: bool = False, tensor_parallel: int = 1):
        self.model_paths = model_paths
        self.default_model = next(iter(model_paths))
        self.default_config = default_config
        self.request_timeout = request_timeout
        self.data_parallel = data_parallel
        self._devices = None
        if data_parallel:
            # with tensor_parallel > 1 each replica target is a disjoint
            # ('tp',) mesh instead of a single chip (DP x TP composition)
            from tts_tpu.parallel.serving import replica_meshes
            self._devices = replica_meshes(tensor_parallel)
        self.tasks: queue.Queue = queue.Queue()
        self.results: dict[str, dict] = {}
        self.abandoned: set[str] = set()      # ids whose submitter timed out
        self.results_cv = threading.Condition()
        self._runners: dict = {}
        self._runner_locks: dict = {}
        self._cache_lock = threading.Lock()
        self.workers = []
        for wid in range(max(n_parallelism, 1)):
            w = threading.Thread(target=self._worker_loop, args=(wid,),
                                 daemon=True)
            w.start()
            self.workers.append(w)

    def _get_runner(self, model: str, wid: int = 0):
        """Shared runner + its lock; loads at most once per (model, chip).

        Without --data-parallel all workers share ONE runner per model
        (weights live once in HBM).  With it, worker w drives the replica
        committed to chip w % n_chips — request-level data parallelism across
        chips (SURVEY §2.9(c)), replacing the reference's share-nothing
        thread replicas."""
        key = model
        if self.data_parallel and self._devices:
            key = (model, wid % len(self._devices))
        with self._cache_lock:
            lock = self._runner_locks.setdefault(key, threading.Lock())
        with lock:
            if key not in self._runners:
                if isinstance(key, tuple):
                    from tts_tpu.parallel.serving import load_replica
                    self._runners[key] = load_replica(
                        self.model_paths[model], self.default_config,
                        self._devices[key[1]])
                else:
                    self._runners[key] = runner_from_file(
                        self.model_paths[model], self.default_config)
        return self._runners[key], lock

    def _worker_loop(self, wid: int = 0):
        while True:
            task = self.tasks.get()
            if task is None:
                return
            result = {"success": False, "message": "unknown error"}
            t0 = time.perf_counter()
            try:
                runner, lock = self._get_runner(task["model"], wid)
                if task["kind"] == "tts_stream":
                    chunks = task["chunks"]
                    cancel = task.get("cancel")
                    try:
                        with lock:
                            if hasattr(runner, "generate_stream"):
                                for piece in runner.generate_stream(
                                        task["prompt"], task["config"]):
                                    if cancel is not None and cancel.is_set():
                                        break  # client gone / timed out
                                    chunks.put(piece)
                            else:
                                resp = runner.generate(task["prompt"], task["config"])
                                chunks.put(resp.audio)
                        result = {"success": True}
                    finally:
                        chunks.put(None)          # end-of-stream sentinel
                elif task["kind"] == "tts":
                    with lock:
                        resp = runner.generate(task["prompt"], task["config"])
                    wall_ms = (time.perf_counter() - t0) * 1e3
                    result = {"success": True, "audio": resp.audio,
                              "sample_rate": resp.sample_rate,
                              "wall_ms": wall_ms,
                              "rtf": (wall_ms / 1e3 / resp.duration_s
                                      if resp.duration_s else None),
                              "timings": resp.timings}
                elif task["kind"] == "voices":
                    voices = {}
                    for m in self.model_paths:
                        r, l = self._get_runner(m, wid)
                        with l:
                            voices[m] = r.list_voices()
                    result = {"success": True, "voices": voices}
                elif task["kind"] == "conditional":
                    with lock:
                        runner.update_conditional_prompt(
                            task["text_encoder_path"], task["prompt"])
                    result = {"success": True}
            except TTSError as e:
                result = {"success": False, "message": str(e), "user_error": True}
            except Exception as e:  # worker must survive any failure
                result = {"success": False, "message": f"{type(e).__name__}: {e}"}
            if "chunks" in task:
                continue  # streaming tasks deliver through their chunk queue
            with self.results_cv:
                if task["id"] in self.abandoned:
                    self.abandoned.discard(task["id"])  # nobody is waiting
                else:
                    self.results[task["id"]] = result
                    self.results_cv.notify_all()

    def freeze_warm_buckets(self) -> list:
        """Pin every loaded runner's bucket ladders to the sets compiled so
        far (call after warmup) — the production p99 guard.  Kokoro pins its
        frame buckets (model.freeze_buckets); the AR runners pin their
        prompt token-buckets (TTSRunner.freeze_buckets), so a first
        unusually long prompt after warmup rounds up within the warmed set
        instead of compiling a new prefill graph mid-serving.  Selections
        beyond a pinned max still fall back to the full ladder.  Returns the
        pinned tuples."""
        with self._cache_lock:
            runners = list(self._runners.values())
        pinned = []
        for r in runners:
            model = getattr(r, "model", None)
            if hasattr(model, "freeze_buckets"):
                pinned.append(model.freeze_buckets())
            if hasattr(r, "freeze_buckets"):
                pinned.append(r.freeze_buckets())
        return pinned

    def submit(self, task: dict, timeout: float | None = None) -> dict:
        timeout = timeout or self.request_timeout
        task["id"] = uuid.uuid4().hex
        self.tasks.put(task)
        with self.results_cv:
            ok = self.results_cv.wait_for(lambda: task["id"] in self.results,
                                          timeout=timeout)
            if not ok:
                # mark abandoned so the worker drops the late result instead
                # of leaking it into `results` forever
                self.abandoned.add(task["id"])
                return {"success": False, "message": "request timed out"}
            return self.results.pop(task["id"])


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            print(f"[srv] {self.address_string()} {fmt % args}", file=sys.stderr)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _read_json(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                return json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return None

        # ------------------------------------------------------------------
        def do_GET(self):
            if self.path == "/health":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/v1/models":
                models = [{"id": m, "object": "model", "owned_by": "tts_tpu"}
                          for m in state.model_paths]
                self._send_json(200, {"object": "list", "data": models})
            elif self.path == "/v1/audio/voices":
                result = state.submit({"kind": "voices", "model": state.default_model})
                if result["success"]:
                    self._send_json(200, result["voices"])
                else:
                    self._send_json(*error_json(result["message"], "server_error", 500))
            elif self.path == "/":
                self._send(200, INDEX_HTML, "text/html")
            else:
                self._send_json(*error_json("not found", "invalid_request_error", 404))

        def do_POST(self):
            if self.path == "/v1/audio/speech":
                self.handle_tts()
            elif self.path == "/v1/audio/conditional-prompt":
                self.handle_conditional()
            else:
                self._send_json(*error_json("not found", "invalid_request_error", 404))

        # ------------------------------------------------------------------
        def handle_tts(self):
            data = self._read_json()
            if data is None or not isinstance(data.get("input"), str):
                self._send_json(*error_json(
                    "the 'input' field is required for tts generation and must "
                    "be passed as a string."))
                return
            if not data["input"]:
                self._send_json(*error_json("the 'input' field must be a non empty string"))
                return
            fmt = data.get("response_format", "wav")
            if fmt not in ("wav", "wave", "aiff", "pcm"):
                self._send_json(*error_json(
                    "Currently 'wav', 'aiff' and 'pcm' (streaming) are the only "
                    "supported formats for the 'response_format' field.",
                    "not_supported_error"))
                return
            model = data.get("model", state.default_model)
            if model not in state.model_paths:
                self._send_json(*error_json(f"Invalid Model: {model}"))
                return
            try:
                cfg = GenerationConfig(
                    temperature=float(data.get("temperature", state.default_config.temperature)),
                    top_k=int(data.get("top_k", state.default_config.top_k)),
                    top_p=float(data.get("top_p", state.default_config.top_p)),
                    repetition_penalty=float(data.get("repetition_penalty",
                                                      state.default_config.repetition_penalty)),
                    voice=data.get("voice", state.default_config.voice),
                    max_tokens=int(data.get("max_tokens",
                                            state.default_config.max_tokens)),
                    sample=bool(data.get("sample", state.default_config.sample)),
                    seed=(int(data["seed"]) if data.get("seed") is not None
                          else state.default_config.seed),
                )
            except (TypeError, ValueError) as e:
                self._send_json(*error_json(f"invalid sampling parameter: {e}"))
                return
            if fmt == "pcm":
                # chunked-transfer stream of 16-bit little-endian PCM; first
                # chunk arrives at time-to-first-audio.  `cancel` stops the
                # worker's generation loop if the client disconnects or the
                # per-chunk request timeout lapses (the reference's pooled
                # tasks have no such guard; without it a gone client pins a
                # worker until the utterance completes).
                import numpy as _np

                chunks: queue.Queue = queue.Queue()
                cancel = threading.Event()
                t_req = time.perf_counter()
                state.tasks.put({"id": uuid.uuid4().hex, "kind": "tts_stream",
                                 "model": model, "prompt": data["input"],
                                 "config": cfg, "chunks": chunks,
                                 "cancel": cancel})
                self.send_response(200)
                self.send_header("Content-Type", "audio/pcm")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                ttfa_ms = None
                n_samples = 0
                status = "done"
                try:
                    while True:
                        try:
                            piece = chunks.get(timeout=state.request_timeout)
                        except queue.Empty:
                            status = "timeout"
                            break
                        if piece is None:
                            break
                        if ttfa_ms is None:
                            ttfa_ms = (time.perf_counter() - t_req) * 1e3
                        n_samples += len(piece)
                        pcm = (_np.clip(piece, -1, 1) * 32767).astype("<i2").tobytes()
                        if pcm:
                            self.wfile.write(f"{len(pcm):X}\r\n".encode())
                            self.wfile.write(pcm)
                            self.wfile.write(b"\r\n")
                    if status == "done":
                        self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError, OSError):
                    status = "client disconnected"
                finally:
                    if status != "done":
                        cancel.set()      # stop the worker's generation loop
                wall = time.perf_counter() - t_req
                print(f"[srv] stream {status}: ttfa={ttfa_ms and round(ttfa_ms, 1)} ms "
                      f"samples={n_samples} wall={wall * 1e3:.1f} ms",
                      file=sys.stderr)
                return
            result = state.submit({"kind": "tts", "model": model,
                                   "prompt": data["input"], "config": cfg})
            if not result["success"]:
                code = 400 if result.get("user_error") else 500
                self._send_json(*error_json(result["message"], "server_error", code))
                return
            if fmt == "aiff":
                body = encode_aiff(result["audio"], result["sample_rate"])
                ctype = "audio/aiff"
            else:
                body = encode_wav(result["audio"], result["sample_rate"])
                ctype = "audio/wav"
            # per-request tracing (SURVEY §5): RTF + wall in headers and log
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if result.get("wall_ms") is not None:
                self.send_header("X-Generation-Time-Ms", f"{result['wall_ms']:.1f}")
            if result.get("rtf") is not None:
                self.send_header("X-RTF", f"{result['rtf']:.4f}")
            self.end_headers()
            self.wfile.write(body)
            rtf = result.get("rtf")
            print(f"[srv] tts done: model={model} wall={result.get('wall_ms', 0):.1f} ms "
                  f"rtf={rtf if rtf is None else round(rtf, 4)} "
                  f"timings={result.get('timings')}", file=sys.stderr)

        def handle_conditional(self):
            data = self._read_json() or {}
            if not isinstance(data.get("prompt"), str) or not data.get("text_encoder_path"):
                self._send_json(*error_json(
                    "'prompt' and 'text_encoder_path' are required"))
                return
            result = state.submit({"kind": "conditional", "model": state.default_model,
                                   "prompt": data["prompt"],
                                   "text_encoder_path": data["text_encoder_path"]})
            if result["success"]:
                self._send_json(200, {"status": "ok"})
            else:
                code = 400 if result.get("user_error") else 500
                self._send_json(*error_json(result["message"], "server_error", code))

    return Handler


def wrap_ssl(server, cert_file: str, key_file: str) -> str:
    """Serve HTTPS when a PEM cert+key pair is given (parity:
    server.cpp:465-475 httplib::SSLServer).  Returns the URL scheme."""
    if not cert_file and not key_file:
        return "http"
    if not (cert_file and key_file):
        raise SystemExit("--ssl-file-cert and --ssl-file-key must be "
                         "passed together")
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_file, key_file)
    server.socket = ctx.wrap_socket(server.socket, server_side=True)
    print(f"Running with SSL: key = {key_file}, cert = {cert_file}",
          file=sys.stderr)
    return "https"


def discover_models(path: str) -> dict[str, str]:
    if os.path.isdir(path):
        out = {}
        for name in sorted(os.listdir(path)):
            if name.endswith(".gguf"):
                out[os.path.splitext(name)[0]] = os.path.join(path, name)
        if not out:
            raise SystemExit(f"no .gguf files found in {path}")
        return out
    name = os.path.splitext(os.path.basename(path))[0] or path
    return {name: path}


def main(argv=None):
    p = argparse.ArgumentParser(prog="tts-server", description=__doc__)
    p.add_argument("--model-path", "-mp", required=True,
                   help="GGUF file, directory of GGUF files, or test:dummy")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--n-parallelism", "-np", type=int, default=1,
                   help="number of worker threads (sharing one runner per "
                        "model unless --data-parallel)")
    p.add_argument("--data-parallel", action="store_true",
                   help="commit one model replica per visible chip and route "
                        "workers across them (multi-chip request parallelism)")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="with --data-parallel: shard each replica across this "
                        "many chips (disjoint tp meshes; DP x TP composition)")
    p.add_argument("--voice", "-v", default="")
    p.add_argument("--temperature", "-t", type=float, default=1.0)
    p.add_argument("--topk", "-tk", type=int, default=50)
    p.add_argument("--top-p", "-tp", type=float, default=1.0)
    p.add_argument("--repetition-penalty", "-r", type=float, default=1.0)
    p.add_argument("--request-timeout", type=float, default=1800.0,
                   help="seconds to wait for a generation (first request may "
                        "pay model load + XLA compiles)")
    p.add_argument("--warmup", action="store_true",
                   help="load the default model and synthesize a short "
                        "utterance before serving")
    # HTTPS (parity: server.cpp:425-426, 465-475 httplib::SSLServer)
    p.add_argument("--ssl-file-cert", "-sfc", default="",
                   help="local path to the PEM encoded ssl cert")
    p.add_argument("--ssl-file-key", "-sfk", default="",
                   help="local path to the PEM encoded ssl private key")
    args = p.parse_args(argv)

    default_config = GenerationConfig(
        voice=args.voice, temperature=args.temperature, top_k=args.topk,
        top_p=args.top_p, repetition_penalty=args.repetition_penalty)
    if args.model_path.startswith("test:"):
        models = {args.model_path[5:]: args.model_path}
    else:
        models = discover_models(args.model_path)
    state = ServerState(models, default_config, args.n_parallelism,
                        request_timeout=args.request_timeout,
                        data_parallel=args.data_parallel,
                        tensor_parallel=args.tensor_parallel)
    if args.warmup:
        # graded lengths compile the bucket ladder typical requests hit; the
        # streaming pass compiles the small first-chunk (TTFA) bucket; the
        # freeze pins kokoro's frame buckets so no compile/AOT-load can land
        # on the serving path afterwards (p99 guard — predictions round up
        # within the warmed set)
        print("warming up (model load + compile)...", file=sys.stderr)
        warm_prompts = [
            "Warm up.",
            "The quick brown fox jumps over the lazy dog near the river bank.",
            "A longer warmup utterance exercises the larger frame buckets: "
            "it spans several clauses and phrases, so the shape ladder the "
            "server will use for typical requests is compiled before the "
            "first client request ever arrives.",
        ]
        ok = True
        for wp in warm_prompts:
            result = state.submit({"kind": "tts", "model": state.default_model,
                                   "prompt": wp, "config": default_config})
            ok = ok and result["success"]
            if not result["success"]:
                print(f"warmup FAILED: {result['message']}", file=sys.stderr)
        runner, lock = state._get_runner(state.default_model)
        if hasattr(runner, "generate_stream"):
            with lock:
                for _ in runner.generate_stream(warm_prompts[0], default_config):
                    break
        pinned = state.freeze_warm_buckets()
        if pinned:
            print(f"warmup pinned frame buckets: {pinned}", file=sys.stderr)
        print(f"warmup {'ok' if ok else 'FAILED'}", file=sys.stderr)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    scheme = wrap_ssl(server, args.ssl_file_cert, args.ssl_file_key)
    print(f"tts-server listening on {scheme}://{args.host}:{args.port} "
          f"(models: {', '.join(models)})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down", file=sys.stderr)


if __name__ == "__main__":
    main()
