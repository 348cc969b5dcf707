"""Pure-Python transcription of difPy's grouping semantics (SURVEY.md §5).

The reference ships no tests, so this oracle IS the fixture generator:
a faithful single-node reimplementation of the reference pipeline's
semantics — exact equality short-circuit (`/root/reference/difPy/dif.py:
726-731`), distance threshold (`dif.py:450,461,497-507`), GREEDY star
grouping with the global ``already_added`` set (`dif.py:533-543`), and
rank-by-quality representative selection (`dif.py:733-742,564-597`) —
run brute-force over ALL pairs, using the exact same signature kernel
(`sparkdedup.functions.shingles.signature_of`) and distance definition
(1 - fraction of agreeing MinHash lanes) as the Spark engine, at
identical shingle/num_perm/seed config.

Engine-vs-oracle comparison happens at two levels (SURVEY.md §2.2):
* **pair closure**: dup-pair recall >= 0.99 — every oracle pair must be
  covered by an engine cluster (same cluster_id on both ends);
* **group parity**: each greedy-star oracle group is a subset of one
  engine connected component.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sparkdedup.config import DedupConfig
from sparkdedup.functions.shingles import minhash_params, signature_of


@dataclass
class OracleOutput:
    # id -> record index; ids are arbitrary sortable keys (e.g. file_id)
    exact_pairs: set[tuple]          # dist == 0 (content equality)
    near_pairs: dict[tuple, float]   # 0 < dist <= threshold
    result: dict                     # difPy-shaped {primary: [[match, dist]]}
    lower_quality: list              # non-best members, ranked out
    groups: list[list]               # greedy-star groups (ids, primary first)


def _distances(ids: list, contents: dict, cfg: DedupConfig
               ) -> tuple[set, dict]:
    """All-pairs exact + near distances (brute force, test scale)."""
    params = minhash_params(cfg.num_perm, cfg.seed)
    sigs = {}
    for i in ids:
        mh, _, n, _ = signature_of(contents[i], cfg.shingle_k, cfg.num_perm,
                                   cfg.seed, cfg.anchor_mod, cfg.max_anchors,
                                   params)
        sigs[i] = mh
    exact, near = set(), {}
    order = sorted(ids)
    mh_mat = np.stack([sigs[i] for i in order])
    for ai in range(len(order)):
        a = order[ai]
        eq = (mh_mat[ai + 1:] == mh_mat[ai]).mean(axis=1)
        for off, j in enumerate(eq):
            b = order[ai + 1 + off]
            if contents[a] == contents[b]:
                exact.add((a, b))
            else:
                dist = 1.0 - float(j)
                if cfg.threshold > 0 and dist <= cfg.threshold:
                    near[(a, b)] = dist
    return exact, near


def _greedy_star(pairs: list[tuple]) -> tuple[dict, list[list]]:
    """difPy _group_result_union (dif.py:533-543): fold the pair list in
    order; each id appears as a match VALUE at most once globally."""
    result: dict = {}
    already_added: set = set()
    for a, b, dist in pairs:
        if b in already_added:
            continue
        if a in already_added and a not in result:
            continue
        result.setdefault(a, []).append([b, dist])
        already_added.add(b)
    groups = [[k] + [m for m, _ in v] for k, v in result.items()]
    return result, groups


def run_oracle(rows: list[dict], cfg: DedupConfig) -> OracleOutput:
    """``rows``: dicts with id, content, n_chars, path (valid rows only)."""
    ids = [r["id"] for r in rows]
    contents = {r["id"]: r["content"] for r in rows}
    meta = {r["id"]: r for r in rows}
    exact, near = _distances(ids, contents, cfg)

    ordered_pairs = (
        [(a, b, 0.0) for a, b in sorted(exact)]
        + [(a, b, near[(a, b)]) for a, b in sorted(near)])
    result, groups = _greedy_star(ordered_pairs)

    # rank-by-quality (dif.py:733-742): best = max n_chars, then path;
    # all non-best members pool into lower_quality, globally distinct.
    lower: set = set()
    for g in groups:
        ranked = sorted(
            g, key=lambda i: (-meta[i]["n_chars"], meta[i]["path"], i))
        lower.update(ranked[1:])
    return OracleOutput(exact_pairs=exact, near_pairs=near, result=result,
                        lower_quality=sorted(lower), groups=groups)


def pair_closure_recall(oracle: OracleOutput,
                        cluster_of: dict) -> tuple[float, int, int]:
    """Fraction of oracle pairs whose endpoints share an engine cluster."""
    pairs = list(oracle.exact_pairs) + list(oracle.near_pairs)
    if not pairs:
        return 1.0, 0, 0
    hit = sum(1 for a, b in pairs
              if cluster_of.get(a) is not None
              and cluster_of.get(a) == cluster_of.get(b))
    return hit / len(pairs), hit, len(pairs)
