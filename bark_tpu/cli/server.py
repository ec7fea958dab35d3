"""HTTP server: POST /bark {"text": ...} -> audio/wav.

Mirrors examples/server/server.cpp:96-188: model loaded once at startup,
`GET /` placeholder, `POST /bark` parses JSON, generates under a global lock
(the reference serializes with a mutex), responds with an IEEE-float WAV.
Unlike the reference it streams from memory instead of bouncing through
/tmp/bark_tmp.wav, and returns proper 4xx errors for malformed requests.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(ctx, lock: threading.Lock, n_threads: int):
    from bark_tpu.api import context as api
    from bark_tpu.utils.wav import wav_bytes

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # the reference uses 600 s read/write timeouts (server.cpp:29-30)
        timeout = 600

        def log_message(self, fmt, *args):
            print(f"server: {fmt % args}", file=sys.stderr)

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj):
            self._reply(
                code, json.dumps(obj).encode(), "application/json"
            )

        def do_GET(self):
            if self.path == "/":
                self._reply(
                    200,
                    b"<html><body><h1>bark-tpu server</h1>"
                    b"<p>POST /bark with {\"text\": ...}</p></body></html>",
                    "text/html",
                )
            else:
                self._reply_json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/bark":
                self._reply_json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._reply_json(400, {"error": "invalid JSON body"})
                return
            text = payload.get("text")
            if not isinstance(text, str) or not text:
                self._reply_json(
                    400, {"error": 'missing required string field "text"'}
                )
                return

            with lock:  # serialize like the reference mutex (server.cpp:130)
                ok = api.bark_generate_audio(ctx, text, n_threads)
                if not ok:
                    self._reply_json(500, {"error": "generation failed"})
                    return
                audio = api.bark_get_audio_data(ctx).copy()

            self._reply(
                200, wav_bytes(audio, ctx.params.sample_rate), "audio/wav"
            )

    return Handler


def main(argv=None) -> int:
    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(prog="bark-tpu-server")
    ap.add_argument("-m", "--model", default="./ggml_weights.bin")
    ap.add_argument("-H", "--host", default="127.0.0.1")
    ap.add_argument("-P", "--port", type=int, default=8080)
    ap.add_argument("-t", "--threads", type=int, default=4)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    from bark_tpu.api import context as api
    from bark_tpu.params import BarkContextParams

    print(f"server: loading model from {args.model}", file=sys.stderr)
    params = BarkContextParams(compute_dtype=args.dtype)
    ctx = api.bark_load_model(args.model, params, args.seed)
    print(
        f"server: model loaded in "
        f"{api.bark_get_load_time(ctx) / 1000.0:.0f} ms",
        file=sys.stderr,
    )

    handler = make_handler(ctx, threading.Lock(), args.threads)
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"server: listening on http://{args.host}:{args.port}",
          file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("server: shutting down", file=sys.stderr)
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
