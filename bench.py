#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Measures Kokoro-82M real-time factor (RTF = seconds-to-generate per second of
audio; <1 is faster than real time) on whatever accelerator JAX finds (the
driver runs this on one real TPU chip).  The model is built at real Kokoro
dimensions with random weights: RTF of this non-autoregressive pipeline is
independent of weight values.

Methodology mirrors the reference's perf_battery (Harvard sentences, mean
generation time / audio seconds — examples/perf_battery/perf_battery.cpp:25-76).
vs_baseline = our RTF / the reference's best published RTF (1.112033 on
M1 Max Metal, README.md:101-103); < 1.0 means faster than the reference.
"""

import json
import os
import sys
import time

# Harvard sentences (IEEE recommended practice, public domain), list 1.
SENTENCES = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It's easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
    "Four hours of steady work faced us.",
    "A large size in stockings is hard to sell.",
]

BASELINE_RTF = 1.112033


def main():
    import jax
    import numpy as np

    # persistent compilation cache: first run pays ~4 min/bucket, reruns are hot
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/tts_tpu_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    model_path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m.gguf")
    if not os.path.exists(model_path):
        print("building random-weight Kokoro-82M gguf...", file=sys.stderr)
        write_kokoro_gguf(model_path, KokoroDims.kokoro_82m(), seed=0)

    runner = runner_from_file(model_path)
    config = GenerationConfig(voice="af_heart", seed=0)

    # warmup: compile the buckets the sentences will hit
    print("warmup/compile...", file=sys.stderr)
    for s in SENTENCES[:3]:
        runner.generate(s, config)

    gen_s = 0.0
    audio_s = 0.0
    for s in SENTENCES:
        t0 = time.perf_counter()
        resp = runner.generate(s, config)
        gen_s += time.perf_counter() - t0
        audio_s += resp.duration_s
        print(f"  {len(s):3d} chars -> {resp.duration_s:6.2f}s audio, "
              f"{(time.perf_counter() - t0) * 1e3:8.1f} ms", file=sys.stderr)

    rtf = gen_s / max(audio_s, 1e-9)
    print(json.dumps({
        "metric": "kokoro_rtf",
        "value": round(rtf, 6),
        "unit": "s_generation_per_s_audio",
        "vs_baseline": round(rtf / BASELINE_RTF, 6),
    }))


if __name__ == "__main__":
    main()
