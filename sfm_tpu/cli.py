"""Command-line interface (SURVEY.md L6, §2.8): per-stage + end-to-end.

    python -m sfm_tpu.cli reconstruct IMAGES_DIR --out OUT_DIR [key=value...]
    python -m sfm_tpu.cli features IMAGES_DIR --out OUT_DIR
    python -m sfm_tpu.cli match IMAGES_DIR --out OUT_DIR
    python -m sfm_tpu.cli export ARTIFACT_DIR --out OUT_DIR [--ply]
    python -m sfm_tpu.cli info ARTIFACT_DIR

Config overrides use dotted paths: sift.max_keypoints=8192 ba.max_iterations=100.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_overrides(items):
    out = {}
    for it in items:
        if "=" not in it:
            raise SystemExit(f"override must be key=value: {it}")
        k, v = it.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass  # keep string
        out[k] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="sfm_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("images", help="image directory")
        sp.add_argument("--out", required=True, help="artifact/output directory")
        sp.add_argument("overrides", nargs="*", help="config overrides key=value")

    add_common(sub.add_parser("reconstruct", help="full pipeline"))
    add_common(sub.add_parser("features", help="feature extraction only"))
    add_common(sub.add_parser("match", help="features + matching/verification"))

    ep = sub.add_parser("export", help="export artifacts to COLMAP text/binary + PLY")
    ep.add_argument("artifacts", help="artifact directory of a completed run")
    ep.add_argument("--out", required=True)
    ep.add_argument("--ply", action="store_true")
    ep.add_argument("--binary", action="store_true",
                    help="also write cameras.bin/images.bin/points3D.bin")

    ip = sub.add_parser("info", help="print reconstruction summary")
    ip.add_argument("artifacts")

    args = p.parse_args(argv)

    if args.cmd in ("reconstruct", "features", "match"):
        from sfm_tpu.config import PipelineConfig, apply_overrides

        cfg = PipelineConfig(artifact_dir=args.out)
        ov = _parse_overrides(args.overrides)
        if ov:
            cfg = apply_overrides(cfg, ov)

        if args.cmd == "reconstruct":
            from sfm_tpu.pipeline.run import run_pipeline
            from sfm_tpu.scene.export import write_colmap_bin, write_colmap_text, write_ply

            rec = run_pipeline(args.images, cfg)
            write_colmap_text(rec, os.path.join(args.out, "sparse"))
            write_colmap_bin(rec, os.path.join(args.out, "sparse"))
            write_ply(rec, os.path.join(args.out, "cloud.ply"))
            print(json.dumps(rec.summary()))
        else:
            # Stage-only runs: reuse the pipeline but stop early by running
            # just the needed stages through the artifact store.
            from sfm_tpu.pipeline import ingest as ing, stages as st
            from sfm_tpu.scene.artifacts import ArtifactStore, input_hash
            from sfm_tpu.config import config_hash

            batch = ing.load_images(args.images, cfg.sift)
            store = ArtifactStore(args.out)
            key = config_hash(cfg) + "-" + input_hash(batch.canvases, batch.names)
            if store.is_complete("features", key):
                feats = store.load_features()
            else:
                feats = st.extract_stage(batch, cfg)
                store.save_features(key, feats)
            print(f"features: {feats.valid.sum(1).tolist()}")
            if args.cmd == "match":
                pairs = st.exhaustive_pairs(len(batch.canvases))
                if store.is_complete("matches", key):
                    graph = store.load_graph()
                else:
                    graph = st.match_and_verify_stage(feats, pairs, batch.intrinsics, cfg, seed=cfg.seed)
                    store.save_graph(key, graph)
                print(f"verified edges: {int(graph.ok.sum())}/{len(graph.pairs)}")
        return 0

    if args.cmd == "export":
        from sfm_tpu.scene.artifacts import ArtifactStore
        from sfm_tpu.scene.export import write_colmap_bin, write_colmap_text, write_ply

        store = ArtifactStore(args.artifacts)
        rec = store.load_reconstruction()
        write_colmap_text(rec, os.path.join(args.out, "sparse"))
        if getattr(args, "binary", False):
            write_colmap_bin(rec, os.path.join(args.out, "sparse"))
        if args.ply:
            write_ply(rec, os.path.join(args.out, "cloud.ply"))
        print(f"exported to {args.out}")
        return 0

    if args.cmd == "info":
        from sfm_tpu.scene.artifacts import ArtifactStore

        store = ArtifactStore(args.artifacts)
        rec = store.load_reconstruction()
        print(json.dumps(rec.summary(), indent=2))
        return 0


if __name__ == "__main__":
    sys.exit(main())
