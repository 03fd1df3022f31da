"""recall@5 probe for selected ANN paths at an arbitrary sf dir.

The per-round recall block in bench.py is pinned to the bench dir
(sf0.1); this probe re-measures chosen paths at the scale-smoke dirs,
where the round-9 measurement found the 32-bit PQ code's resolution
ceiling (PERFORMANCE.md "30x recall": recall@5 0.325 at n=60k under the
auto budget). It exists to measure the code-resolution lever (pq_k)
against that boundary without re-running the full bench ladder.

Usage: python tools/ann_recall_probe.py [sf_dir] [path ...]
Paths: pq (4-bit ADC), pq64 (8-bit ADC), ivf_pq, ivf_pq64, hamming,
ivf (exact rerank), index_sla (on-disk index, recall_sla=0.9 →
residual pre-rank + max(auto, ceil(SLA_RERANK_FRACTION·n)) budget,
4% per the two-density calibration), index_sla_exact
(recall_sla=1.0 → exact scoring of probed cells). Default: pq pq64
ivf_pq64.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from mapreducelearnings_spark.catalog import load_table
    from mapreducelearnings_spark.pipeline import simsearch as SS
    from mapreducelearnings_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke/sf0.30"
    wanted = sys.argv[2:] or ["pq", "pq64", "ivf_pq64"]

    spark = get_spark("ann-recall-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()

    truth: dict[int, set] = {}
    for r in SS.cosine_topk(emb, n_queries=8, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in truth.values())

    def recall(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return round(
            sum(len(truth[q] & got.get(q, set())) for q in truth) / n_truth, 4
        )

    def _index_path():
        from mapreducelearnings_spark import queries as Q

        return Q._session_index(spark, sf_dir)

    paths = {
        "pq": lambda: SS.pq_adc_topk(emb, n_queries=8, k=5),
        "pq64": lambda: SS.pq_adc_topk(emb, n_queries=8, k=5, pq_k=SS.PQ_K64),
        "ivf_pq": lambda: SS.ivf_pq_topk(emb, n_queries=8, k=5),
        "ivf_pq64": lambda: SS.ivf_pq_topk(
            emb, n_queries=8, k=5, pq_k=SS.PQ_K64
        ),
        "hamming": lambda: SS.hamming_ann_topk(emb, n_queries=8, k=5),
        # retired-from-registry ladder rungs (r12): recall role stays
        # measured here and in bench's recall block — multiprobe is the
        # half-memory/2L-probes LSH point (Lv et al. VLDB'07), trained
        # PQ the Lloyd-refined-codebook point (MIPS-vs-L2 caveat on its
        # old @retire doc)
        "lsh_multiprobe": lambda: SS.lsh_ann_topk_multiprobe(
            emb, n_queries=8, k=5
        ),
        "pq_trained": lambda: SS.pq_adc_topk(
            emb,
            n_queries=8,
            k=5,
            trained_rounds=SS.PQ_LLOYD_ROUNDS,
            train_sample_mod=4,
        ),
        "ivf": lambda: SS.ivf_topk(emb, n_queries=8, k=5),
        "ivf_pq64_residual": lambda: SS.ivf_pq_residual_topk(
            emb, n_queries=8, k=5
        ),
        "index_sla": lambda: SS.ann_index_topk(
            spark, _index_path(), emb, n_queries=8, k=5, recall_sla=0.9
        ),
        "index_sla_exact": lambda: SS.ann_index_topk(
            spark, _index_path(), emb, n_queries=8, k=5, recall_sla=1.0
        ),
    }
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "auto_rerank_R": 5 * SS.hamming_auto_mult(n),
        "sla_rerank_R": SS.sla_rerank_rows(n, 5),
        "recall_at_5": {},
        "sec": {},
    }
    for name in wanted:
        t0 = time.time()
        out["recall_at_5"][name] = recall(paths[name]().collect())
        out["sec"][name] = round(time.time() - t0, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
