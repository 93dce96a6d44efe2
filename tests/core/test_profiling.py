"""The jax.profiler trace helper (SURVEY §5 "JAX profiler hooks").

The wall-clock counters in print_perf_report cannot attribute time INSIDE
a fused kernel or jitted rollout; utils.profiling.trace captures a device
trace and summarize_trace digests it (device busy %, top ops). Exercised
here on the CPU backend — the same chrome-trace format the TPU backend
emits, so the parser is fully covered without hardware.
"""

import jax
import jax.numpy as jnp


def test_trace_captures_and_summarizes(tmp_path, capsys):
    from flygym_tpu.utils.profiling import summarize_trace, trace

    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((256, 256), jnp.float32)
    f(x).block_until_ready()  # compile outside the trace window
    with trace(logdir, summarize=False) as got_dir:
        f(x).block_until_ready()
    assert got_dir == logdir

    digest = summarize_trace(logdir)
    out = capsys.readouterr().out
    assert digest is not None, out
    assert digest["span_ms"] > 0
    # The traced jit computation must show up as events somewhere (CPU
    # runtime attribution varies by jax version: device lanes or host
    # threads), and the printed digest leads with the span line.
    assert digest["device_busy_ms"] > 0 or digest["host_event_ms"] > 0
    assert "[trace] span" in out


def test_summarize_trace_empty_dir(tmp_path, capsys):
    from flygym_tpu.utils.profiling import summarize_trace

    assert summarize_trace(str(tmp_path)) is None
    assert "no trace file" in capsys.readouterr().out
