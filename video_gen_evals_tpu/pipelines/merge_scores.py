"""Merge per-host ``video_scores`` shards from a multi-pod scoring sweep.

SURVEY §5.8 rebuild plan: "multi-pod scoring sweeps shard the video manifest
over hosts and merge JSON on DCN". The per-host shards come from
``pipelines.score --num-hosts N --host-id I`` (each host scores a disjoint
strided slice of the generated manifest — see ``parallel.shard_items``); this
CLI reassembles the single ``video_scores.json`` the reference's ``eval.py``
writes (ref ``eval.py:439-453``) and, given ``--human-scores``, computes the
final sign-inverted Spearman/Pearson (ref ``eval.py:456-464``) — correlations
need every video, so they run here rather than per shard.
"""

from __future__ import annotations

import json
import typing as T


def merge_score_shards(
    shards: T.Sequence[T.Dict[str, T.Dict[str, float]]],
) -> T.Dict[str, T.Dict[str, float]]:
    """Union of per-host ``{vid: {ac, tc}}`` dicts.

    A video appearing in more than one shard with identical scores is
    tolerated (idempotent re-runs); conflicting scores raise — that means two
    hosts scored the same video differently (manifest drift between hosts).
    """
    merged: T.Dict[str, T.Dict[str, float]] = {}
    for shard in shards:
        for vid, entry in shard.items():
            prev = merged.get(vid)
            if prev is not None and prev != entry:
                raise ValueError(
                    f"conflicting scores for {vid!r} across shards: "
                    f"{prev} vs {entry} — hosts scanned different manifests?"
                )
            merged[vid] = entry
    return merged


def main(argv: T.Optional[T.List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Merge per-host video_scores shards (multi-pod sweep)"
    )
    p.add_argument("shards", nargs="+", help="per-host video_scores JSONs")
    p.add_argument("--output", default="video_scores.json")
    p.add_argument("--human-scores", default=None,
                   help="human MOS JSON — computes the final sign-inverted "
                        "Spearman on the merged set (ref eval.py:456-464)")
    args = p.parse_args(argv)

    loaded = []
    for path in args.shards:
        with open(path) as f:
            loaded.append(json.load(f))
    merged = merge_score_shards(loaded)
    with open(args.output, "w") as f:
        json.dump(merged, f, indent=2)
    print(
        f"Merged {len(args.shards)} shards -> {len(merged)} videos "
        f"in {args.output}"
    )

    if args.human_scores:
        from ..metrics.correlation import match_and_correlate

        with open(args.human_scores) as f:
            human = json.load(f)
        ac_only = {k: v["ac"] for k, v in merged.items() if "ac" in v}
        tc_only = {k: v["tc"] for k, v in merged.items() if "tc" in v}
        for key, scores in (("ac_corr", ac_only), ("tc_corr", tc_only)):
            corr = match_and_correlate(scores, human, key.split("_")[0])
            if corr["spearman"] is not None:
                print(
                    f"{key}: spearman={corr['spearman']:.4f} (n={corr['n']})"
                )


if __name__ == "__main__":
    main()
