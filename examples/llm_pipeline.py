"""End-to-end LLM training-data pipeline on the public API — runnable:

    python examples/llm_pipeline.py [sf_dir]

Composes the engine's operator families the way a pretraining data job
would: corpus card -> quality gate -> exact + near-dup removal ->
leakage-audited train/val/test split (doc-hash audit, cluster-aware
fix) -> token-budget epoch plan -> vocabulary -> token-id encoding ->
sequence packing -> embedding near-dup audit. Every step is a pure
DataFrame transform; nothing collects until the final summary.

Defaults to the sf0.001 testdata so it runs in seconds; point it at a
bigger sf_dir (or your own documents/embeddings parquet with the same
schemas) unchanged.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import pythonvectordb_spark as pv
from pythonvectordb_spark.operators.curation import quality_filter
from pythonvectordb_spark.sources.testdata import load_table


def run(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = pv.get_spark("llm-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. corpus card (one pass)
    card = pv.corpus_stats(docs).first().asDict()

    # 2. quality gate: keep docs passing the composite filter
    kept = quality_filter(docs).filter(F.col("keep")).select("doc_id")
    docs_q = docs.join(kept, "doc_id")

    # 3. dedup: exact survivors, then near-dup pair resolution (pairs
    # and the resolution feed several later steps -> lazy checkpoints)
    pairs = pv.minhash_lsh_pairs(docs_q, threshold=0.8).localCheckpoint(eager=False)
    resolved = pv.resolve_duplicates(docs_q, pairs).localCheckpoint(eager=False)
    docs_d = docs_q.join(
        resolved.filter(F.col("is_survivor")).select("doc_id"), "doc_id"
    )

    # 3b. train/val/test split, leakage-audited: the doc-hash split is
    # checked against the near-dup pairs; the cluster-aware split
    # (hash the dup component, not the doc) is leak-free by construction
    from pythonvectordb_spark.operators.curation import (
        cluster_aware_split,
        epoch_plan,
        split_leakage,
        split_leakage_matrix,
    )

    naive_leak = (
        split_leakage(pairs, docs_q)
        .filter(F.col("leak") == 1)
        .agg(F.sum("n_pairs"))
        .first()[0]
        or 0
    )
    assigned = cluster_aware_split(resolved).localCheckpoint(eager=False)
    fixed_leak = (
        split_leakage_matrix(pairs, assigned)
        .filter(F.col("leak") == 1)
        .agg(F.sum("n_pairs"))
        .first()[0]
        or 0
    )

    # 3b'. survivorship policy check: keep-best-quality vs keep-smallest-id
    # (same components; counts how many groups a quality policy re-picks)
    from pythonvectordb_spark.operators.curation import ngram_coverage
    from pythonvectordb_spark.operators.dedup import resolve_keep_best
    from pythonvectordb_spark.operators.textops import text_quality

    quality = text_quality(docs_q).select("doc_id", "quality_score")
    by_quality = resolve_keep_best(quality, pairs)
    upgraded = (
        by_quality.filter(F.col("is_survivor"))
        .join(
            resolved.filter(F.col("is_survivor")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        .count()
    )

    # 3b''. soft-memorization audit: how much of the held-out split's
    # n-grams the train split already covers (1.0 = fully memorizable)
    cov = ngram_coverage(docs_q, n=3)
    mean_cov = cov.agg(F.avg("coverage")).first()[0] or 0.0

    # 3c. token-budget epoch plan over the deduplicated corpus, plus the
    # UniMax capped-uniform allocation as the alternative policy
    from pythonvectordb_spark.operators.curation import unimax_epochs

    plan = epoch_plan(docs_d, budget_tokens=100_000)
    n_oversampled = plan.filter(F.col("oversampled") == 1).count()
    unimax = unimax_epochs(docs_d, budget=100_000, max_epochs=4)
    n_capped = unimax.filter(F.col("capped") == 1).count()

    # 4. vocabulary + token-id encoding (single corpus scan encode)
    vocab = pv.build_vocab(docs_d, vocab_size=512)
    encoded = pv.encode_tokens(docs_d, vocab)

    # 5. pack into fixed-length training sequences (distributed prefix sum)
    packed = pv.pack_sequences(docs_d, seq_len=256)

    # 6. embedding near-dup audit on the vector side (LSH-blocked)
    vec_dups = pv.embedding_near_dup(emb, threshold=0.4)

    summary = {
        "corpus": card,
        "after_quality": docs_q.count(),
        "after_dedup": docs_d.count(),
        "split_leak_pairs_doc_hash": int(naive_leak),
        "split_leak_pairs_cluster": int(fixed_leak),
        "sources_oversampled": n_oversampled,
        "sources_unimax_capped": n_capped,
        "survivors_upgraded_by_quality": int(upgraded),
        "heldout_ngram_coverage": round(float(mean_cov), 4),
        "vocab_size": vocab.count(),
        "encoded_docs": encoded.count(),
        "n_sequences": int(
            packed.agg(F.max("seq_last")).first()[0] or -1
        )
        + 1,
        "boundary_doc_frac": round(
            packed.filter(F.col("spans_boundary")).count() / max(packed.count(), 1), 4
        ),
        "embedding_near_dup_pairs": vec_dups.count(),
    }
    return summary


if __name__ == "__main__":
    out = run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    for k, v in out.items():
        print(f"{k}: {v}")
