"""bench.py warm-probe failure diagnostics.

The fresh-process warm probe is the bench record's proof that the
persistent compile cache serves one-shot CLI users (VERDICT r4 #1). On
probe failure the recorded reason embeds a stderr tail; with
jax_explain_cache_misses on (enabled by bench's _CompileLog) the raw
tail is tracing-cache WARNING spam, so _probe_tail must prefer the
probe's '[warm-probe +Ns]' stage-timestamp lines — those attribute a
hang to a stage (imports/render/registration).
"""

import importlib.util
import pathlib

_BENCH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("_bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_tail_prefers_stage_stamps():
    bench = _load_bench()
    stderr = (
        "WARNING:jax:_src.dispatch:Finished tracing foo\n"
        "[warm-probe +0.2s] imports done\n"
        "WARNING:jax: PERSISTENT COMPILATION CACHE MISS for 'jit_sin'\n"
        "[warm-probe +5.1s] render done\n"
        "WARNING:jax: tracing cache miss explained\n"
    )
    assert bench._probe_tail(stderr) == (
        "[warm-probe +0.2s] imports done | [warm-probe +5.1s] render done"
    )


def test_probe_tail_falls_back_to_raw_tail():
    bench = _load_bench()
    assert bench._probe_tail("a\nb\nc\nd") == "b | c | d"
    assert bench._probe_tail("") == ""
    assert bench._probe_tail(None) == ""


def test_probe_tail_bounded():
    bench = _load_bench()
    long = "\n".join(f"[warm-probe +{i}s] " + "x" * 200 for i in range(5))
    assert len(bench._probe_tail(long)) <= 300
