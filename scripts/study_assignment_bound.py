#!/usr/bin/env python
"""Measure-first study for the round-5/6 backlog item "spread-bound
assignment coupling": would a GLOBAL pairs-budget ASSIGNMENT bound —
greedily filling the whole-doc adjacency budget with the largest per-pair
caps — prune docs the current ``least(global, per-pair-sum)`` cap cannot?

Current bounds in plans/compiler._upper_bound_expr (per doc, kept leaves
with occurrence counts c_i, N = sum c_i, budget B = min(N-1, 2(N-max c)),
per-pair interval gap g_ab, cap(g) = 0.5/(0.001 g + 0.1), multiplicity
m_ab = min(2 c_a, 2 c_b, c_a+c_b-1)):

- GLOBAL:  cap(min g_ab) * B
- SUM:     sum_ab cap(g_ab) * m_ab
- existing pair bonus bound = min(GLOBAL, SUM)

Candidate ASSIGNMENT bound: sort pairs by cap desc, spend the budget B:
  A = sum cap_(i) * min(m_(i), B - already_spent)
A <= GLOBAL (caps <= cap_max) and A <= SUM (takes <= m) always; the study
quantifies how much SMALLER it gets on shapes engineered in its favor, and
how all three compare to the kernel's ACTUAL best hit rating (the thing
theta is compared against), using core.oracle as referee.

Run: PYTHONPATH=/root/repo python scripts/study_assignment_bound.py
(pure Python, no Spark; ~seconds)
"""

import itertools
import json
import sys

import numpy as np

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse

DIST = 100


def cap(gap: float) -> float:
    return 0.5 / (0.001 * gap + 0.1)


def bounds(layout):
    """(global, sum, assignment) pair-bonus bounds + leaf `hi` for an AND
    of the layout's words — float64 mirror of _upper_bound_expr (exact
    algo: seed 0; no f32 pad, which only widens all three equally)."""
    words = sorted(layout)
    c = {w: len(p) for w, p in layout.items()}
    lo_st = {w: min(p) for w, p in layout.items()}
    hi_st = {w: max(p) for w, p in layout.items()}
    n = sum(c.values())
    budget = max(0.0, min(n - 1, 2 * (n - max(c.values()))))

    pairs = []
    for a, b in itertools.combinations(words, 2):
        g = max(0.0, lo_st[a] - hi_st[b], lo_st[b] - hi_st[a])
        m = max(0.0, min(2 * c[a], 2 * c[b], c[a] + c[b] - 1))
        pairs.append((cap(g), m))
    g_min_cap = max((cp for cp, _ in pairs), default=cap(0.0))
    glob = g_min_cap * budget
    ssum = sum(cp * m for cp, m in pairs)
    assign, left = 0.0, budget
    for cp, m in sorted(pairs, reverse=True):
        take = min(m, left)
        assign += cp * take
        left -= take
        if left <= 0:
            break

    # leaf hi for the LEFT-most word of the AND chain (compiler: AND's
    # interval = left side's): seed 0 + session bonus when merge possible
    w0 = words[0]
    merge_possible = c[w0] >= 2 and (
        c[w0] != 2 or (hi_st[w0] - lo_st[w0]) <= DIST
    )
    hi = 2.0 if merge_possible else 0.0
    return glob, ssum, assign, hi


def actual_best(layout):
    """Max kernel hit rating for AND(words) over the single-doc layout."""
    words = sorted(layout)
    ast = parse(" ".join(words))

    def stream(w):
        if w not in layout:
            return None
        return [(0, int(p), np.float32(0.0)) for p in sorted(layout[w])]

    hits = oracle.occurrences_pipeline(ast, stream, DIST)
    return max((float(h.rating) for h in hits), default=0.0)


def mk_layout(counts, sections, spacing=6):
    """words laid out in byte sections: sections[w] = (start, interleave)
    — occurrences at start + i*spacing (interleave packs words together
    by sharing a section start)."""
    out = {}
    for w, cnt in counts.items():
        s = sections[w]
        out[w] = [s + i * spacing for i in range(cnt)]
    return out


def main() -> int:
    rows = []

    # --- shape family 1: heterogeneous-gap triangles (the engineered
    # best case for assignment: Σm >> B with DIFFERENT caps)
    for ca, cb, cc in [(10, 10, 10), (50, 50, 50), (100, 100, 100),
                       (100, 50, 10), (200, 200, 200)]:
        for gaps in [(0, 400, 1000), (100, 400, 1000), (0, 0, 5000),
                     (100, 100, 100), (50, 2000, 8000)]:
            g_ab, g_ac, g_bc = gaps
            # place sections to realize approximately those pairwise gaps:
            # a at 0.., b after gap_ab, c after gap_ac from a
            counts = {"aa": ca, "bb": cb, "cc": cc}
            la = [i * 6 for i in range(ca)]
            b0 = la[-1] + 6 + g_ab
            lb = [b0 + i * 6 for i in range(cb)]
            c0 = max(la[-1], lb[-1]) + 6 + g_bc
            lc = [c0 + i * 6 for i in range(cc)]
            layout = {"aa": la, "bb": lb, "cc": lc}
            glob, ssum, assign, hi = bounds(layout)
            act = actual_best(layout)
            existing = min(glob, ssum)
            rows.append({
                "family": "triangle",
                "counts": [ca, cb, cc],
                "gaps": list(gaps),
                "global": round(glob, 2),
                "sum": round(ssum, 2),
                "assign": round(assign, 2),
                "existing": round(existing, 2),
                "actual_best": round(act, 2),
                "tighten_x": round(existing / assign, 3) if assign else None,
                "slack_left_x": round(
                    (hi + assign - act) / max(1e-9, hi + existing - act), 3
                ),
            })

    # --- shape family 2: interleaved pair + far heavy word (sum bound's
    # home turf — check assignment doesn't promise anything new here)
    for ca, cb, cc in [(20, 20, 200), (5, 5, 500)]:
        la = [i * 12 for i in range(ca)]
        lb = [6 + i * 12 for i in range(cb)]          # interleaved with a
        c0 = max(la[-1], lb[-1]) + 5000
        lc = [c0 + i * 6 for i in range(cc)]
        layout = {"aa": la, "bb": lb, "cc": lc}
        glob, ssum, assign, hi = bounds(layout)
        act = actual_best(layout)
        existing = min(glob, ssum)
        rows.append({
            "family": "pair+far",
            "counts": [ca, cb, cc],
            "global": round(glob, 2),
            "sum": round(ssum, 2),
            "assign": round(assign, 2),
            "existing": round(existing, 2),
            "actual_best": round(act, 2),
            "tighten_x": round(existing / assign, 3) if assign else None,
        })

    # --- random layouts: how often does assignment tighten at all?
    rng = np.random.default_rng(7)
    n_tighten, max_tighten, n_cases = 0, 1.0, 200
    for _ in range(n_cases):
        k = rng.integers(2, 5)
        counts = {f"w{j}": int(rng.integers(1, 120)) for j in range(k)}
        sections = {}
        cursor = 0
        for w in counts:
            cursor += int(rng.integers(0, 3000))
            sections[w] = cursor
            cursor += counts[w] * 6
        layout = mk_layout(counts, sections)
        glob, ssum, assign, _hi = bounds(layout)
        existing = min(glob, ssum)
        if assign < existing * 0.999:
            n_tighten += 1
            max_tighten = max(max_tighten, existing / assign)

    out = {
        "engineered": rows,
        "random": {
            "cases": n_cases,
            "tightened": n_tighten,
            "max_tighten_x": round(max_tighten, 3),
        },
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
