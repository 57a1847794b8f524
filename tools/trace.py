"""Capture a JAX device trace for a command and summarize per-program op
categories (the workflow used to find the round-1 hot spots).

Usage:
  python tools/trace.py --out /tmp/trace -- python -c "..."   # trace a child
or in-process:
  from tools.trace import capture, summarize
  with capture("/tmp/trace"):
      run_workload()
  summarize("/tmp/trace")
"""

from __future__ import annotations

import contextlib
import glob
import json
import sys


@contextlib.contextmanager
def capture(out_dir: str):
    import jax

    with jax.profiler.trace(out_dir):
        yield


def summarize(out_dir: str, top: int = 8):
    """Parse the xplane with xprof's op_profile converter and print per-
    program category times (ms, summed across the trace)."""
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(f"{out_dir}/plugins/profile/*/*.xplane.pb")
    if not files:
        print("no xplane found under", out_dir)
        return
    data, _ = rtd.xspace_to_tool_data(files, "op_profile",
                                      {"graph_viewer_options": {}})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data
    root = d.get("byProgram", {})
    for prog in root.get("children", []):
        t_ms = prog.get("metrics", {}).get("rawTime", 0) / 1e9
        print(f"\n{prog.get('name')}: {t_ms:.1f} ms total")
        cats = sorted(prog.get("children", []),
                      key=lambda c: -c.get("metrics", {}).get("rawTime", 0))
        for c in cats[:top]:
            m = c.get("metrics", {})
            print(f"  {c.get('name'):28s} {m.get('rawTime', 0)/1e9:9.1f} ms  "
                  f"(x{m.get('occurrences', 0)})")


def main():
    args = sys.argv[1:]
    if "--" not in args:
        # just summarize an existing trace dir
        summarize(args[args.index("--out") + 1] if "--out" in args else args[0])
        return
    i = args.index("--")
    out = args[args.index("--out") + 1] if "--out" in args else "/tmp/tts_tpu_trace"
    import subprocess

    cmd = args[i + 1:]
    env_line = f"import jax; jax.profiler.start_trace({out!r})"
    print("tracing:", " ".join(cmd), file=sys.stderr)
    subprocess.run([sys.executable, "-c",
                    f"{env_line}\nimport runpy, sys\nsys.argv = {cmd[1:]!r}\n"
                    f"runpy.run_path({cmd[1]!r}, run_name='__main__')\n"
                    "jax.profiler.stop_trace()"], check=False)
    summarize(out)


if __name__ == "__main__":
    main()
