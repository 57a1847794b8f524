"""CLI and server end-to-end tests using the weight-free dummy runner."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from tts_tpu.utils.audio import read_wav


def test_cli_dummy_writes_wav(tmp_path, capsys):
    from tts_tpu.apps.cli import main
    out = tmp_path / "out.wav"
    rc = main(["--model-path", "test:dummy", "--prompt", "abc",
               "--save-path", str(out)])
    assert rc == 0
    audio, sr = read_wav(str(out))
    assert sr == 44100
    assert len(audio) == 3 * 44100          # 1s of sine per character
    assert np.abs(audio).max() > 0.1


def test_cli_rejects_bad_top_p(tmp_path):
    from tts_tpu.apps.cli import main
    rc = main(["--model-path", "test:dummy", "--prompt", "x",
               "--top-p", "1.5", "--save-path", str(tmp_path / "o.wav")])
    assert rc == 1


def test_cli_conditional_requires_encoder(tmp_path):
    from tts_tpu.apps.cli import main
    rc = main(["--model-path", "test:dummy", "--prompt", "x",
               "--conditional-prompt", "calm voice",
               "--save-path", str(tmp_path / "o.wav")])
    assert rc == 1


def test_vad_trims_trailing_silence():
    from tts_tpu.runtime.vad import trim_silence
    sr = 24000
    t = np.arange(sr, dtype=np.float32) / sr
    speech = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    trimmed = trim_silence(np.concatenate([speech, silence]), sr)
    assert len(trimmed) < sr + sr // 2
    assert len(trimmed) >= sr


def test_audio_roundtrip(tmp_path):
    from tts_tpu.utils.audio import encode_aiff, write_wav
    sr = 24000
    x = (0.4 * np.sin(np.linspace(0, 100, 4800))).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(str(p), x, sr)
    y, sr2 = read_wav(str(p))
    assert sr2 == sr
    np.testing.assert_allclose(x, y, atol=1e-4)
    aiff = encode_aiff(x, sr)
    assert aiff[:4] == b"FORM" and aiff[8:12] == b"AIFF"


@pytest.fixture(scope="module")
def server_port():
    from http.server import ThreadingHTTPServer
    from tts_tpu.apps.server import ServerState, make_handler
    from tts_tpu.runtime.api import GenerationConfig

    state = ServerState({"dummy": "test:dummy"}, GenerationConfig(), 2)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address[1]
    srv.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_server_health_and_models(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/health") as r:
        assert json.loads(r.read()) == {"status": "ok"}
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/v1/models") as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "dummy"


def test_server_speech_wav(server_port):
    status, body, ctype = _post(server_port, "/v1/audio/speech", {"input": "hi"})
    assert status == 200
    assert ctype == "audio/wav"
    assert body[:4] == b"RIFF"
    assert len(body) > 2 * 44100 * 2  # two seconds of 16-bit audio


def test_server_speech_aiff(server_port):
    status, body, ctype = _post(server_port, "/v1/audio/speech",
                                {"input": "hi", "response_format": "aiff"})
    assert status == 200
    assert ctype == "audio/aiff"
    assert body[:4] == b"FORM"


def test_server_rejects_bad_requests(server_port):
    status, body, _ = _post(server_port, "/v1/audio/speech", {})
    assert status == 400
    assert "input" in json.loads(body)["error"]["message"]

    status, body, _ = _post(server_port, "/v1/audio/speech",
                            {"input": "x", "response_format": "mp3"})
    assert status == 400

    status, body, _ = _post(server_port, "/v1/audio/speech",
                            {"input": "x", "model": "nope"})
    assert status == 400
    assert "Invalid Model" in json.loads(body)["error"]["message"]


def test_server_voices(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/v1/audio/voices") as r:
        voices = json.loads(r.read())
    assert voices == {"dummy": ["dummy"]}


def test_server_pcm_streaming(server_port):
    status, body, ctype = _post(server_port, "/v1/audio/speech",
                                {"input": "ab", "response_format": "pcm"})
    assert status == 200
    assert ctype == "audio/pcm"
    # 2 chars -> 2s of 44.1k 16-bit pcm from the dummy runner
    pcm = np.frombuffer(body, "<i2")
    assert len(pcm) == 2 * 44100
    assert np.abs(pcm).max() > 1000


def test_server_index_page(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/") as r:
        page = r.read().decode()
    # the interactive UI, not a placeholder: speak form + sampling knobs
    for needle in ("v1/audio/speech", "textarea", "temperature", "top_k",
                   "voice", "<script>"):
        assert needle in page


def test_server_https(tmp_path):
    """wrap_ssl serves the same API over TLS (parity: server.cpp:465-475)."""
    import ssl
    import subprocess
    from http.server import ThreadingHTTPServer

    from tts_tpu.apps.server import ServerState, make_handler, wrap_ssl
    from tts_tpu.runtime.api import GenerationConfig

    cert, key = str(tmp_path / "c.pem"), str(tmp_path / "k.pem")
    subprocess.run(["openssl", "req", "-x509", "-newkey", "rsa:2048",
                    "-keyout", key, "-out", cert, "-days", "1", "-nodes",
                    "-subj", "/CN=localhost"], check=True, capture_output=True)
    state = ServerState({"dummy": "test:dummy"}, GenerationConfig(), 1)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    assert wrap_ssl(srv, cert, key) == "https"
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        port = srv.server_address[1]
        with urllib.request.urlopen(f"https://127.0.0.1:{port}/health",
                                    context=ctx) as r:
            assert json.loads(r.read()) == {"status": "ok"}
    finally:
        srv.shutdown()


def test_server_request_config_fields(server_port):
    """seed / max_tokens / sample in the JSON body reach the runner's
    GenerationConfig (previously silently ignored)."""
    from tts_tpu.apps import server as server_mod

    # run the parse path directly: a recording fake runner captures cfg
    captured = {}

    class Recorder:
        sample_rate = 44100

        def generate(self, text, config):
            captured["config"] = config
            from tts_tpu.runtime.api import TTSResponse
            return TTSResponse(audio=np.zeros(10, np.float32), sample_rate=44100)

    state = server_mod.ServerState({"rec": "test:dummy"},
                                   server_mod.GenerationConfig(), 1)
    state._runners["rec"] = Recorder()
    state._runner_locks["rec"] = threading.Lock()
    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer(("127.0.0.1", 0), server_mod.make_handler(state))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        status, _, _ = _post(srv.server_address[1], "/v1/audio/speech",
                             {"input": "x", "seed": 7, "max_tokens": 123,
                              "sample": False, "temperature": 0.5})
        assert status == 200
        cfg = captured["config"]
        assert cfg.seed == 7 and cfg.max_tokens == 123
        assert cfg.sample is False and cfg.temperature == 0.5
        status, body, _ = _post(srv.server_address[1], "/v1/audio/speech",
                                {"input": "x", "seed": "not-a-number"})
        assert status == 400
    finally:
        srv.shutdown()


def test_server_stream_cancellation():
    """A cancelled stream task stops the worker's generation loop early
    instead of running the whole utterance for a gone client."""
    import queue as queue_mod

    from tts_tpu.apps.server import ServerState
    from tts_tpu.runtime.api import GenerationConfig

    yielded = []
    release = threading.Event()

    class SlowStreamer:
        sample_rate = 44100

        def generate_stream(self, text, config):
            for i in range(50):
                yielded.append(i)
                yield np.zeros(64, np.float32)
                release.wait(2.0)  # cancel is set while we're "generating"

    state = ServerState({"slow": "test:dummy"}, GenerationConfig(), 1)
    state._runners["slow"] = SlowStreamer()
    state._runner_locks["slow"] = threading.Lock()
    chunks: queue_mod.Queue = queue_mod.Queue()
    cancel = threading.Event()
    state.tasks.put({"id": "t1", "kind": "tts_stream", "model": "slow",
                     "prompt": "x", "config": GenerationConfig(),
                     "chunks": chunks, "cancel": cancel})
    assert chunks.get(timeout=5.0) is not None     # first chunk arrived
    cancel.set()
    release.set()
    # the sentinel must arrive promptly; the generator stops long before 50
    assert chunks.get(timeout=5.0) is None or chunks.get(timeout=5.0) is None
    time.sleep(0.2)
    assert len(yielded) < 10


def test_cli_list_voices(capsys):
    from tts_tpu.apps.cli import main
    rc = main(["--model-path", "test:dummy", "--prompt", "x", "--list-voices"])
    assert rc == 0
    assert "dummy" in capsys.readouterr().out


def test_espeak_gracefully_unavailable():
    """Without libespeak-ng, the espeak path raises a recoverable TTSError."""
    from tts_tpu.text import espeak
    from tts_tpu.runtime.api import TTSError
    if espeak.available():
        import pytest
        pytest.skip("espeak installed here")
    from tts_tpu.text.phonemizer import Phonemizer
    ph = Phonemizer(None, None, mode="espeak")
    import pytest
    with pytest.raises(TTSError):
        ph.text_to_phonemes("hello")


def test_server_warmup_freezes_kokoro_buckets(tmp_path):
    """ServerState.freeze_warm_buckets pins every loaded kokoro runner's
    frame-bucket ladder (the serving-path p99 guard behind --warmup)."""
    from tts_tpu.apps.server import ServerState
    from tts_tpu.runtime.api import GenerationConfig
    from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf

    path = tmp_path / "k.gguf"
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0, duration_bias=-2.6)
    state = ServerState({"k": str(path)}, GenerationConfig(voice="af_heart"), 1)
    r = state.submit({"kind": "tts", "model": "k", "prompt": "warm up.",
                      "config": GenerationConfig(voice="af_heart", seed=0)})
    assert r["success"], r["message"]
    pinned = state.freeze_warm_buckets()
    assert pinned and pinned[0], "no kokoro buckets pinned"
    runner, _ = state._get_runner("k")
    assert runner.model._pinned_fbuckets == pinned[0]
