"""Profiler-trace attribution of the blocked coupled kernel (VERDICT
r04 task 1): capture a jax.profiler trace of the production exact
coupled trapezoid (512^2x50, S=4, tj=12) and report where the
~0.09 ms/substep between the ablation floor (0.457) and the record
(0.543) goes — DMA wait vs compute, per-op if the trace carries it.

The trace lands as an xplane.pb protobuf.  No TensorFlow/tensorboard
profile plugin ships in this environment, so ``summarize_xspace``
decodes the wire format directly (generic varint/length-delimited
parser + the known XSpace field numbers) and aggregates event
durations per line (core/queue) and per event name.

Usage:
    python tools/coupled_trace.py [S [tj]] [--steps N] [--dir OUT]

Falls back with a clear message if the axon relay produces no trace
content (device-side collection is stack-dependent).
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ------------------------------------------------------------------ #
# Minimal protobuf wire decoder (no deps)
# ------------------------------------------------------------------ #
def _read_varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def summarize_xspace(path):
    """{(plane, line): {event_name: (total_ps, count)}} from an
    xplane.pb file.

    Field numbers confirmed against this stack's traces (2026-08-20):
    XSpace: planes=1; XPlane: name=2 lines=3 event_metadata=4;
    XLine: id=1 name=2 events=4; XEvent: metadata_id=1 offset_ps=2
    duration_ps=3 stats=4; XEventMetadata (map value): id=1 name=2."""
    space = open(path, "rb").read()
    out = {}
    for fno, _, plane in _fields(space):
        if fno != 1:
            continue
        pname, lines, meta = "", [], {}
        for f2, _, v2 in _fields(plane):
            if f2 == 2:
                pname = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:
                # map entry: key=1 (varint), value=2 (XEventMetadata)
                k = None
                mname = ""
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, _, v4 in _fields(v3):
                            if f4 == 1:
                                k = v4
                            elif f4 == 2:
                                mname = v4.decode("utf-8", "replace")
                if k is not None:
                    meta[k] = mname
        for line in lines:
            lname, events = "", defaultdict(lambda: [0, 0])
            for f3, wt3, v3 in _fields(line):
                if f3 == 2 and wt3 == 2:
                    lname = v3.decode("utf-8", "replace")
                elif f3 == 4 and wt3 == 2:
                    mid = dur = 0
                    for f4, _, v4 in _fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                    ev = events[meta.get(mid, f"#{mid}")]
                    ev[0] += dur
                    ev[1] += 1
            if events:
                out[(pname, lname)] = {k: tuple(v)
                                       for k, v in events.items()}
    return out


def report(space_summary, top=14):
    for (plane, line), events in sorted(space_summary.items()):
        total_us = sum(ps for ps, _ in events.values()) / 1e6
        print(f"\n== plane {plane!r} line {line!r}: "
              f"{total_us:.1f} us total busy ==")
        for name, (ps, n) in sorted(events.items(),
                                    key=lambda kv: -kv[1][0])[:top]:
            print(f"  {ps/1e6:10.1f} us  x{n:<6d} {name[:84]}")


def main():
    argv = sys.argv[1:]
    pos = []
    skip = False
    for i, a in enumerate(argv):
        if skip:
            skip = False
            continue
        if a in ("--steps", "--dir"):
            skip = True
        elif not a.startswith("-"):
            pos.append(a)
    mu_only = "--mu-only" in sys.argv
    S = int(pos[0]) if pos else (8 if mu_only else 4)
    tj = int(pos[1]) if len(pos) > 1 else (None if mu_only else 12)
    steps = 40 if not mu_only else 81
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    out_dir = "/tmp/wrf_tpu_trace"
    if "--dir" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--dir") + 1]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wrf_tpu.io import fixtures
    from wrf_tpu.models.small_step import SmallStepLoop
    from wrf_tpu.parallel.mesh import make_mesh
    from wrf_tpu.parallel.sharded import ShardedAdvanceMuT, case_to_domain
    from wrf_tpu.utils.health import wait_healthy_inline

    wait_healthy_inline()
    mesh = make_mesh([jax.devices()[0]], (1, 1))
    nx = ny = 512
    nz = 50
    case = fixtures.make_case(nx, ny, nz, halo=3, seed=42)
    if mu_only:
        # the bench HEADLINE row: exact blocked mu_t-only loop
        loop = ShardedAdvanceMuT(mesh, nx, ny, nz, case.flags,
                                 n_steps=steps, vary_winds=True,
                                 inner_steps=S, tj=tj)
    else:
        loop = SmallStepLoop(mesh, nx, ny, nz, case.flags, n_steps=steps,
                             inner_steps=S, tj=tj)
    arrays = loop.prepare(case_to_domain(case))
    scalars = (case.rdx, case.rdy, case.dts, case.epssm)

    def run():
        out = loop(arrays, *scalars)
        return float(jnp.sum(out["t"][:, 0, :]) + jnp.sum(out["mu"]))

    assert np.isfinite(run())  # compile + warm
    run()

    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        run()
    wall = time.perf_counter() - t0
    print(f"traced run: {wall*1e3:.1f} ms wall for {steps} substeps "
          f"(S={S}, tj={tj})")

    pbs = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("NO TRACE CONTENT: the relay produced no xplane.pb — "
              "device-side profiling is unavailable on this stack; "
              "fall back to the scan2x/theta2x slack arms "
              "(tools/coupled_decomp.py)")
        return 1
    print(f"parsing {pbs[-1]}")
    report(summarize_xspace(pbs[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
