"""HLO collective audit + analytic ICI scaling model.

The reference has no distributed backend at all (SURVEY §0), so the
multi-chip story is new capability — and with no multi-chip hardware in
this image, the scaling-efficiency claim must rest on something a reviewer
can recompute rather than a single noisy virtual-CPU measurement. This
module provides that: it enumerates every collective XLA inserted into a
compiled sharded program (op, element type, shape, bytes, mesh axis) and
combines the byte totals with the measured single-chip step time into an
analytic ICI-time model.

Model (the scaling-book recipe, jax-ml.github.io/scaling-book):

* A bidirectional-ring all-reduce of ``D`` bytes over an axis of ``n``
  chips moves ``2·D·(n−1)/n`` bytes through each chip's slowest link pair;
  with ``links`` ICI links serving the axis at ``link_gbytes_s`` each-way,
  the bandwidth-bound time is ``2·D·(n−1)/n / (links · link_gbytes_s)``.
* Weak-scaling efficiency at ``n`` chips (per-device batch held constant)
  is ``t_compute / (t_compute + t_collective(n))`` — compute per chip is
  unchanged, collectives are the only added cost.

Hardware constants default to TPU v5e: 4 ICI links/chip in a 2-D torus at
45 GB/s per direction; a 1-D data-parallel axis uses 2 of them (one ring).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Sequence

__all__ = [
    "Collective",
    "parse_collectives",
    "annotate_loop_placement",
    "collective_summary",
    "allreduce_time_s",
    "modeled_efficiency",
]

# HLO collective opcodes we account for. ``-start`` variants (async) are
# folded into their base op; ``-done`` lines carry no shape info we need.
_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")

# replica_groups in explicit ({{0,1},{2,3}}) or iota ([2,4]<=[8] / ...T(1,0)) form
_GROUPS_RE = re.compile(
    r"replica_groups=(\{[^}]*\}+|\[[\d,]+\]<=\[[\d,]+\](?:T\([\d,]*\))?)"
)


@dataclasses.dataclass(frozen=True)
class Collective:
    """One collective instruction from optimized HLO."""

    op: str            # base opcode, e.g. "all-reduce"
    result_shape: str  # raw result shape text, e.g. "f32[256,1500]"
    bytes: int         # payload bytes (sum over tuple elements)
    replica_groups: str  # raw replica_groups text ("" if absent)

    @property
    def group_size(self) -> int:
        """Devices per replica group (the collective's axis size).

        Handles both the explicit form ``{{0,1,...},...}`` and the iota
        form ``[num_groups,group_size]<=[...]``.
        """
        m = re.match(r"\[(\d+),(\d+)\]<=", self.replica_groups)
        if m:
            return int(m.group(2))
        groups = re.findall(r"\{([\d,]+)\}", self.replica_groups)
        if not groups:
            return 0
        return len(groups[0].split(","))


def _shape_bytes(shape_text: str) -> int:
    """Bytes of an HLO shape string (handles tuples; ignores layout)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue  # token[] etc. carry no payload
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_collectives(hlo_text: str) -> list[Collective]:
    """Enumerate collective instructions in optimized-HLO text.

    Matches both sync (``all-reduce(``) and async (``all-reduce-start(``)
    forms; each instruction is counted once.
    """
    out: list[Collective] = []
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        for op in _COLLECTIVE_OPS:
            m = re.search(
                rf"=\s*(.+?)\s+{op}(?:-start)?\(", line
            )
            if m is None:
                continue
            # `all-reduce-done` also contains "all-reduce" via the -start
            # regex alternation guard: skip explicit -done lines.
            if f"{op}-done" in line:
                continue
            shape_text = m.group(1)
            g = re.search(_GROUPS_RE, line)
            out.append(
                Collective(
                    op=op,
                    result_shape=shape_text.strip(),
                    bytes=_shape_bytes(shape_text),
                    replica_groups=g.group(1) if g else "",
                )
            )
            break
    return out


def annotate_loop_placement(hlo_text: str) -> list[tuple[Collective, bool]]:
    """Pair each collective with whether it executes inside a ``while`` loop.

    A collective inside a while body runs once per loop iteration — for the
    rollout scan that multiplies its ICI traffic by T, which is exactly the
    failure mode the shard_map train step exists to rule out. Containment is
    computed structurally: parse HLO computation blocks, build the
    body=/condition=/calls=/to_apply= caller graph, and walk each
    collective's chain to ENTRY checking for while-body computations.
    """
    comps: dict[str, list[str]] = {}
    cur: str | None = None
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(ENTRY\s+)?%([\w.\-]+)\s*\(", s)
        if m and s.endswith("{"):
            cur = m.group(2)
            comps[cur] = []
            continue
        if s == "}":
            cur = None
            continue
        if cur is not None:
            comps[cur].append(s)

    callers: dict[str, set[str]] = {}
    while_bodies: set[str] = set()
    for name, lines in comps.items():
        for l in lines:
            for ref in re.findall(
                r"(?:body|condition|calls|to_apply)=%([\w.\-]+)", l
            ):
                callers.setdefault(ref, set()).add(name)
            for wb in re.findall(r"body=%([\w.\-]+)", l):
                while_bodies.add(wb)

    def inside_while(comp: str) -> bool:
        seen: set[str] = set()
        frontier = {comp}
        while frontier:
            c = frontier.pop()
            if c in seen:
                continue
            seen.add(c)
            if c in while_bodies:
                return True
            frontier |= callers.get(c, set())
        return False

    out: list[tuple[Collective, bool]] = []
    for name, lines in comps.items():
        placed = inside_while(name)
        for l in lines:
            for op in _COLLECTIVE_OPS:
                m = re.search(rf"=\s*(.+?)\s+{op}(?:-start)?\(", l)
                if m is None or f"{op}-done" in l:
                    continue
                g = re.search(_GROUPS_RE, l)
                out.append((
                    Collective(
                        op=op,
                        result_shape=m.group(1).strip(),
                        bytes=_shape_bytes(m.group(1)),
                        replica_groups=g.group(1) if g else "",
                    ),
                    placed,
                ))
                break
    return out


def collective_summary(collectives: Sequence[Collective]) -> dict[str, Any]:
    """Totals per opcode + overall payload bytes."""
    per_op: dict[str, dict[str, int]] = {}
    for c in collectives:
        d = per_op.setdefault(c.op, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += c.bytes
    return {
        "per_op": per_op,
        "total_count": len(collectives),
        "total_bytes": sum(c.bytes for c in collectives),
    }


def allreduce_time_s(
    payload_bytes: float,
    n_chips: int,
    link_gbytes_s: float = 45.0,
    links_per_axis: int = 2,
) -> float:
    """Bandwidth-bound bidirectional-ring all-reduce time on one ICI axis."""
    if n_chips <= 1:
        return 0.0
    axis_bw = links_per_axis * link_gbytes_s * 1e9
    return 2.0 * payload_bytes * (n_chips - 1) / n_chips / axis_bw


def modeled_efficiency(
    compute_s: float,
    allreduce_bytes: float,
    n_chips: int,
    link_gbytes_s: float = 45.0,
    links_per_axis: int = 2,
    latency_us_per_hop: float = 1.0,
) -> float:
    """Weak-scaling efficiency = compute / (compute + collective time).

    Adds a per-hop latency term (~1 µs/hop on ICI) so tiny payloads don't
    model as free; it is negligible for the gradient all-reduce sizes here.
    """
    t_bw = allreduce_time_s(allreduce_bytes, n_chips, link_gbytes_s,
                            links_per_axis)
    t_lat = (n_chips - 1) * latency_us_per_hop * 1e-6 if n_chips > 1 else 0.0
    return compute_s / (compute_s + t_bw + t_lat)


def efficiency_table(
    compute_s: float,
    allreduce_bytes: float,
    chip_counts: Sequence[int] = (1, 2, 4, 8),
    **kw,
) -> list[dict[str, float]]:
    """Rows of {chips, t_collective_ms, efficiency} for BASELINE.md."""
    rows = []
    for n in chip_counts:
        t_c = allreduce_time_s(allreduce_bytes, n,
                               kw.get("link_gbytes_s", 45.0),
                               kw.get("links_per_axis", 2))
        rows.append({
            "chips": n,
            "t_collective_ms": t_c * 1e3,
            "efficiency": modeled_efficiency(
                compute_s, allreduce_bytes, n, **kw
            ),
        })
    return rows


def _fmt_bytes(b: float) -> str:
    if b >= 1 << 20:
        return f"{b / (1 << 20):.2f} MiB"
    if b >= 1 << 10:
        return f"{b / (1 << 10):.2f} KiB"
    return f"{int(b)} B"
