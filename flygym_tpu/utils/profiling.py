"""Performance reporting: tabulated wall-clock breakdowns.

Parity reference: flygym ``utils/profiling.py`` (single-world :9-115, parallel
:118-241, environment detection :244-260). Same report surface — time/step,
percent, throughput, realtime factor, with parallel aggregate columns — on top
of the TPU runtime's timing counters.
"""

import contextlib
import glob
import gzip
import json
import os
import textwrap
from typing import Literal

from tabulate import tabulate

__all__ = [
    "print_perf_report",
    "print_perf_report_parallel",
    "check_environment",
    "trace",
    "summarize_trace",
]


def _stage_rows(total_physics_ns, total_render_ns, n_steps, n_frames, timestep):
    total_ns = total_physics_ns + total_render_ns
    physics = _stage_stats(total_physics_ns, total_ns, n_steps, timestep)
    total = _stage_stats(total_ns, total_ns, n_steps, timestep)
    if n_frames == 0:
        render = (float("nan"),) * 4
        per_frame_us = float("nan")
    else:
        render = _stage_stats(total_render_ns, total_ns, n_steps, timestep)
        per_frame_us = 1e-3 * total_render_ns / n_frames
    return physics, render, total, per_frame_us


def _stage_stats(stage_ns, total_ns, n_steps, timestep):
    per_iter_us = 1e-3 * stage_ns / n_steps
    percent = 100 * stage_ns / total_ns if total_ns else float("nan")
    throughput = 1e9 * n_steps / stage_ns if stage_ns else float("inf")
    realtime_x = throughput * timestep
    return per_iter_us, percent, throughput, realtime_x


def _emit(table, headers, floatfmt, rendering_note, show_in_notebook):
    tab_str = tabulate(
        table,
        headers=headers,
        floatfmt=floatfmt,
        tablefmt="html" if show_in_notebook else "simple_grid",
    )
    if show_in_notebook:
        from IPython.display import HTML, display

        print("PERFORMANCE PROFILE")
        display(HTML(tab_str))
        print(rendering_note)
    else:
        tab_width = max(len(line) for line in tab_str.splitlines())
        print()
        print("PERFORMANCE PROFILE".center(tab_width))
        print(tab_str)
        print(textwrap.fill(rendering_note, width=tab_width))
        print()


def _render_note(n_frames, n_steps, per_frame_us):
    if n_frames == 0:
        return "* Note: No frames were rendered."
    return (
        f"* Note: {n_frames} frames were rendered out of {n_steps} steps. "
        f"Therefore, rendering time per image is {per_frame_us:.0f} us."
    )


def print_perf_report(
    total_physics_time_ns: int,
    total_render_time_ns: int,
    n_steps: int,
    n_frames_rendered: int,
    timestep: float,
    show_in_notebook: bool | Literal["auto"] = "auto",
) -> None:
    """Print a single-world performance report.

    Args:
        total_physics_time_ns: Wall-clock spent in physics steps (ns).
        total_render_time_ns: Wall-clock spent rendering (ns).
        n_steps: Number of physics steps taken.
        n_frames_rendered: Number of frames rendered.
        timestep: Simulation timestep (s).
        show_in_notebook: Render as an HTML table ("auto" = detect Jupyter).
    """
    if show_in_notebook == "auto":
        show_in_notebook = check_environment() == "notebook"
    if n_steps == 0:
        raise ValueError("n_steps must be > 0 to print performance report.")

    physics, render, total, per_frame_us = _stage_rows(
        total_physics_time_ns, total_render_time_ns, n_steps, n_frames_rendered,
        timestep,
    )
    table = [
        ["Physics simulation advancement", *physics],
        ["Rendering*", *render],
        ["TOTAL", *total],
    ]
    headers = [
        "\nStage",
        "Time/step\n(us)",
        "Percent\n(%)",
        "Throughput\n(iters/s)",
        "Throughput\nx realtime",
    ]
    _emit(
        table,
        headers,
        ("s", ".0f", ".0f", ".0f", ".2f"),
        _render_note(n_frames_rendered, n_steps, per_frame_us),
        show_in_notebook,
    )


def print_perf_report_parallel(
    total_physics_time_ns: int,
    total_render_time_ns: int,
    n_steps: int,
    n_frames_rendered: int,
    timestep: float,
    n_worlds: int,
    n_worlds_rendered: int,
    show_in_notebook: bool | Literal["auto"] = "auto",
) -> None:
    """Print a multi-world performance report with aggregate columns.

    Note: profiling a ``rollout`` (whole episode in one XLA program) cannot be
    broken down per stage — the analog of the reference's hint that profiling
    is incompatible with CUDA-graph capture (``profiling.py:145-151``).
    """
    if show_in_notebook == "auto":
        show_in_notebook = check_environment() == "notebook"
    if n_steps == 0:
        raise ValueError(
            "n_steps must be > 0 to print performance report. "
            "Hint: Did you run the whole episode inside a single jitted "
            "rollout? If so, per-stage profiling cannot be meaningfully done; "
            "time the rollout call instead."
        )

    physics, render, total, per_frame_us = _stage_rows(
        total_physics_time_ns, total_render_time_ns, n_steps, n_frames_rendered,
        timestep,
    )
    table = [
        [
            "Physics simulation advancement",
            *physics,
            physics[2] * n_worlds,
            physics[3] * n_worlds,
        ],
        [
            "Rendering*",
            *render,
            render[2] * n_worlds_rendered,
            render[3] * n_worlds_rendered,
        ],
        ["TOTAL", *total, total[2] * n_worlds, total[3] * n_worlds],
    ]
    headers = [
        "\nStage",
        "Time/step\n(us)",
        "Percent\n(%)",
        "Throughput\n(iters/s)",
        "Throughput\nx realtime",
        "Throughput\n(iters/s)\n(parallelized)",
        "Throughput\nx realtime\n(parallelized)",
    ]
    _emit(
        table,
        headers,
        ("s", ".0f", ".0f", ".0f", ".2f", ".0f", ".2f"),
        _render_note(n_frames_rendered, n_steps, per_frame_us),
        show_in_notebook,
    )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/flygym_tpu_trace", *, summarize: bool = True):
    """Capture a ``jax.profiler`` device trace of the enclosed block.

    The wall-clock counters in :func:`print_perf_report` cannot attribute
    time INSIDE a fused kernel or a jitted rollout (SURVEY §5 "JAX profiler
    hooks"); this wraps ``jax.profiler.start_trace``/``stop_trace`` and, on
    exit, parses the captured chrome-trace and prints where the time went —
    device compute (top ops by busy time) vs host/dispatch.

    Usage::

        with flygym_tpu.utils.profiling.trace() as logdir:
            sim.rollout(ctrl, 1000)
            jax.block_until_ready(sim.state.qpos)

    Block until ready INSIDE the context or the async dispatch escapes the
    trace window. The raw trace stays under ``logdir`` for TensorBoard /
    ``xprof``; ``summarize=False`` skips the printed digest.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        if summarize:
            summarize_trace(logdir)


def _load_trace_events(logdir: str) -> "list[dict]":
    pats = [
        os.path.join(logdir, "**", "*.trace.json.gz"),
        os.path.join(logdir, "**", "*.trace.json"),
    ]
    paths = [p for pat in pats for p in glob.glob(pat, recursive=True)]
    if not paths:
        return []
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def summarize_trace(logdir: str, top: int = 12) -> "dict | None":
    """Parse the newest chrome-trace under ``logdir`` and print a digest.

    Groups complete events ("ph" == "X") by process: device lanes (process
    names containing "TPU"/"GPU"/"/device:") vs host threads, then prints
    total busy time per side and the top ops by summed device duration.
    Returns the digest as a dict (``None`` when no trace file is found).
    """
    events = _load_trace_events(logdir)
    if not events:
        print(f"[trace] no trace file found under {logdir}")
        return None
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_ops: dict = {}
    dev_total = 0.0
    host_total = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        ts = float(e.get("ts", 0.0))
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)
        pname = pid_name.get(e.get("pid"), "")
        is_device = any(
            k in pname for k in ("TPU", "GPU", "/device:", "Device")
        ) and "host" not in pname.lower()
        if is_device:
            dev_total += dur
            name = e.get("name", "?")
            dev_ops[name] = dev_ops.get(name, 0.0) + dur
        else:
            host_total += dur
    span = max(span_hi - span_lo, 1e-9)
    rows = sorted(dev_ops.items(), key=lambda kv: -kv[1])[:top]
    digest = {
        "span_ms": span / 1e3,
        "device_busy_ms": dev_total / 1e3,
        "device_busy_frac": dev_total / span,
        "host_event_ms": host_total / 1e3,
        "top_device_ops": [
            (n, d / 1e3, 100.0 * d / max(dev_total, 1e-9)) for n, d in rows
        ],
    }
    print(
        f"[trace] span {digest['span_ms']:.1f} ms — device busy "
        f"{digest['device_busy_ms']:.1f} ms "
        f"({100 * digest['device_busy_frac']:.0f}%), host-side events "
        f"{digest['host_event_ms']:.1f} ms"
    )
    if rows:
        print(
            tabulate(
                [(n, f"{ms:.2f}", f"{pc:.1f}") for n, ms, pc in
                 digest["top_device_ops"]],
                headers=["device op", "ms", "% busy"],
                tablefmt="simple_grid",
            )
        )
    return digest


def check_environment() -> str:
    """Detect the execution environment: "notebook", "terminal", "other", or
    "standard_python"."""
    try:
        from IPython import get_ipython

        shell = get_ipython().__class__.__name__
        if shell == "ZMQInteractiveShell":
            return "notebook"
        if shell == "TerminalInteractiveShell":
            return "terminal"
        return "other"
    except (NameError, ImportError, AttributeError):
        return "standard_python"
