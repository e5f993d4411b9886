#!/usr/bin/env python
"""Numpy simulation behind the r5 ANN retrieval decisions (PLANS.md).

Simulates the engine's exact LSH bucketing / margin quantization / probe
budget and the IVF one-step-Lloyd quantizer in numpy, so probe-order and
nprobe variants can be recall-swept in seconds instead of Spark minutes.
The simulation was validated against the real engine: pure-margin order
measured 0.248 here vs 0.245 in the Spark fixture at 70k.

Recorded outputs (2026-08, this box):

  LSH probe-order sweep (gate fixture n=500/8 bits/P=93; 70k/12 bits/P=79)
    margin (sc, rm)              gate 0.600   70k 0.248
    systematic (popcount,sc,rm)  gate 0.700   70k 0.231
    union hybrid H=P/4           gate 0.600   70k 0.248
    union hybrid H=P/2           gate 0.633   70k 0.249
    union hybrid H=3P/4          gate 0.633   70k 0.234
  -> decision: REGIME SWITCH (tier 3 -> systematic, else margin) attains
     the max of both columns; the union hybrid recovers neither fully.

  IVF nprobe sweep (70k uniform, C=512, one-step Lloyd):
    nprobe  2     4     8     16    32
    recall  0.117 0.192 0.286 0.420 0.597
    scan%   0.9   1.9   3.8   7.6   14.9
  -> decision: IVF_TARGET_CANDIDATES=1024 => nprobe=8 at this shape (the
     knee); clamps to [2, C] elsewhere.

  Second Lloyd step (VERDICT r4 suggestion) — measured and REJECTED:
    uniform 70k @ nprobe=8:  1 step 0.311, 2 steps 0.296, 3 steps 0.296
      (tighter Voronoi cells shrink the candidate pool: 3089 -> 2736)
    clustered 70k (200 Gaussian centers) @ nprobe=8: 1.000 at EVERY step
  -> the extra oracle-twin aggregation buys nothing on either regime.

Usage: python tools/sim_ann_probe_orders.py [gate_parquet_path]
(defaults to /root/testdata/sf0.001/embeddings.parquet for the gate
fixture; the 70k fixture is synthesized uniformly.)
"""

from __future__ import annotations

import math
import sys
from collections import defaultdict

import numpy as np

try:
    import duckdb
except ImportError:  # pragma: no cover
    duckdb = None

LSH_TARGET_POP = 16
LSH_LO, LSH_HI = 8, 24
ANN_TARGET = 256.0
POOL_BITS = 10
MSCALE = 1 << 20


def bits_for(n):
    if n <= 0:
        return LSH_LO
    return max(LSH_LO, min(LSH_HI, int(math.floor(math.log2(n / 16.0)))))


def tier_for(n, bits):
    p1 = 1 + bits
    p2 = p1 + bits * (bits - 1) // 2
    if p1 * n / 2.0**bits >= ANN_TARGET:
        return 1
    if p2 * n / 2.0**bits >= ANN_TARGET:
        return 2
    return 3


def pcount_for(n, bits):
    t = tier_for(n, bits)
    p = 1 + bits
    if t >= 2:
        p += bits * (bits - 1) // 2
    if t >= 3:
        p += bits * (bits - 1) * (bits - 2) // 6
    return min(p, 1 << min(bits, POOL_BITS))


def buckets(emb, bits):
    j = np.arange(bits)
    return ((emb[:, j] > emb[:, (j + 8) % 64]).astype(np.int64) * (1 << j)).sum(1)


def margins(emb, bits):
    j = np.arange(bits)
    return np.floor(
        np.abs(emb[:, j].astype(np.float64) - emb[:, (j + 8) % 64].astype(np.float64))
        * MSCALE
    ).astype(np.int64)


def probe_masks(emb_q, bits, P, scheme, H=None):
    """Per query: array of real bit-flip masks to probe, under `scheme`:
    margin=(sc,rm), tier=(popcount,sc,rm), hybrid=tier-top-H + margin fill."""
    n = len(emb_q)
    L = min(bits, POOL_BITS)
    mg = margins(emb_q, bits)
    order = np.lexsort((np.arange(bits)[None, :].repeat(n, 0), mg))
    S = 1 << L
    smasks = np.arange(S)
    pc = np.array([bin(s).count("1") for s in range(S)])
    bitsel = [(smasks >> i) & 1 for i in range(L)]
    out = []
    for q in range(n):
        rk_m = mg[q][order[q]][:L]
        rk_b = order[q][:L]
        sc = np.zeros(S, dtype=np.int64)
        rm = np.zeros(S, dtype=np.int64)
        for i in range(L):
            sel = bitsel[i].astype(bool)
            sc[sel] += rk_m[i]
            rm[sel] += 1 << rk_b[i]
        if scheme == "margin":
            idx = np.lexsort((rm, sc))[:P]
        elif scheme == "tier":
            idx = np.lexsort((rm, sc, pc))[:P]
        elif scheme == "hybrid":
            t_idx = np.lexsort((rm, sc, pc))[:H]
            tset = set(rm[t_idx])
            m_order = np.lexsort((rm, sc))
            fill = [i for i in m_order if rm[i] not in tset][: P - H]
            idx = (
                np.concatenate([t_idx, np.array(fill, dtype=np.int64)])
                if fill
                else t_idx
            )
        else:
            raise ValueError(scheme)
        out.append(rm[idx])
    return out


def lsh_recall(emb, scheme, H=None, qmod=97, k=5):
    n = len(emb)
    bits = bits_for(n)
    P = pcount_for(n, bits)
    bk = buckets(emb, bits)
    qidx = np.where(np.arange(n) % qmod == 0)[0]
    e = emb.astype(np.float64)
    norms = np.sqrt((e * e).sum(1))
    probes = probe_masks(emb[qidx], bits, P, scheme, H)
    members = defaultdict(list)
    for i, b in enumerate(bk):
        members[b].append(i)
    hits = total = 0
    for qi_i, qi in enumerate(qidx):
        cos = (e @ e[qi]) / (norms * norms[qi])
        cos[qi] = -9
        top = set(np.argsort(-cos)[:k])
        cand = set()
        for rm_ in probes[qi_i]:
            cand.update(members.get(int(bk[qi]) ^ int(rm_), []))
        cand.discard(qi)
        ranked = sorted(cand, key=lambda c: (-cos[c], c))[:k]
        hits += len(set(ranked) & top)
        total += k
    return hits / total


def ivf_recall(emb, nprobe, pop=128, lo=16, hi=4096, qmod=97, k=5):
    n = len(emb)
    raw = n / pop
    C = max(lo, min(hi, int(2 ** math.floor(math.log2(raw))) if raw >= 1 else 0))
    step = max(1, n // (8 * C))
    samp_idx = np.where(np.arange(n) % step == 0)[0]
    init = emb[samp_idx[:C]].astype(np.float64)
    d = ((emb[samp_idx, None, :].astype(np.float64) - init[None, :, :]) ** 2).sum(2)
    a = np.argmin(d, 1)
    cent = init.copy()
    for kk in range(C):
        m = samp_idx[a == kk]
        if len(m):
            cent[kk] = emb[m].astype(np.float64).mean(0)
    e = emb.astype(np.float64)
    asg = np.empty(n, dtype=np.int64)
    for i in range(0, n, 4096):
        dd = ((e[i : i + 4096, None, :] - cent[None, :, :]) ** 2).sum(2)
        asg[i : i + 4096] = np.argmin(dd, 1)
    norms = np.sqrt((e * e).sum(1))
    members = defaultdict(list)
    for i, kk in enumerate(asg):
        members[kk].append(i)
    qidx = np.where(np.arange(n) % qmod == 0)[0]
    hits = total = cand_sz = 0
    for qi in qidx:
        dd = ((e[qi][None, :] - cent) ** 2).sum(1)
        probes = np.argsort(dd)[:nprobe]
        cos = (e @ e[qi]) / (norms * norms[qi])
        cos[qi] = -9
        top = set(np.argsort(-cos)[:k])
        cand = set()
        for p in probes:
            cand.update(members[p])
        cand.discard(qi)
        cand_sz += len(cand)
        ranked = sorted(cand, key=lambda c: (-cos[c], c))[:k]
        hits += len(set(ranked) & top)
        total += k
    return hits / total, cand_sz / len(qidx) / n


def main():
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/embeddings.parquet"
    )
    fixtures = {}
    if duckdb is not None:
        rows = duckdb.sql(
            f"select embedding from '{path}' order by vec_id"
        ).fetchall()
        fixtures["gate"] = np.array([r[0] for r in rows], dtype=np.float32)
    rng = np.random.default_rng(12345)
    fixtures["70k-uniform"] = (
        rng.random((70_000, 64), dtype=np.float64) - 0.5
    ).astype(np.float32)

    print("LSH probe-order sweep:")
    for name, emb in fixtures.items():
        P = pcount_for(len(emb), bits_for(len(emb)))
        for scheme, H in [
            ("margin", None),
            ("tier", None),
            ("hybrid", P // 2),
        ]:
            r = lsh_recall(emb, scheme, H)
            print(f"  {name:12s} {scheme:7s} H={H}: recall@5={r:.3f}")
    print("IVF nprobe sweep (70k-uniform):")
    for np_ in (2, 4, 8, 16):
        r, frac = ivf_recall(fixtures["70k-uniform"], np_)
        print(f"  nprobe={np_:2d}: recall@5={r:.3f} scan={frac * 100:.1f}%")


if __name__ == "__main__":
    main()
