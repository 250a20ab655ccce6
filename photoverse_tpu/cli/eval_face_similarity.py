"""Offline face-similarity eval CLI.

CLI form of the reference's `utils/face_similarity.py` __main__ demo
(/root/reference/utils/face_similarity.py:108-124): compare an input
identity photo against every generated image in a results directory and
print per-image + mean ArcFace/FaceNet cosine similarity (0.0 when no face
is detected, matching the reference's fallback).

Usage:
  python -m photoverse_tpu.cli.eval_face_similarity \\
      --input_image face.jpg --results_dir results \\
      --model arcface --model_weights arcface_resnet18.pth \\
      --mtcnn_weights mtcnn.pt
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PhotoVerse face-similarity eval")
    p.add_argument("--input_image", type=str, required=True,
                   help="The identity photo the generations should match")
    p.add_argument("--results_dir", type=str, required=True,
                   help="Directory of generated images (png/jpg)")
    p.add_argument("--model", type=str, default="arcface",
                   choices=["arcface", "facenet"])
    p.add_argument("--model_weights", type=str, default=None,
                   help="Pretrained embedder .pt (converted on load); "
                        "REQUIRED for meaningful scores")
    p.add_argument("--mtcnn_weights", type=str, default=None,
                   help="MTCNN .pt weights for face detection; without "
                        "them the full image is used as the face crop")
    p.add_argument("--json", action="store_true",
                   help="Emit one JSON object instead of a table")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from photoverse_tpu.utils.face_similarity import FaceSimilarity

    if args.model_weights is None:
        print("WARNING: no --model_weights — the embedder is randomly "
              "initialized and similarities are meaningless (testing only)")

    sim = FaceSimilarity(
        model_name=args.model,
        weights_path=args.model_weights,
        mtcnn_weights_path=args.mtcnn_weights,
    )
    exts = (".png", ".jpg", ".jpeg")
    files = sorted(
        f for f in os.listdir(args.results_dir)
        if f.lower().endswith(exts)
    )
    if not files:
        raise SystemExit(f"no images in {args.results_dir}")
    # embed the input identity ONCE; each generated image embeds once
    ref_emb = sim.face_embedding(args.input_image)
    if ref_emb is None:
        # every score is 0.0 by the reference's no-face rule — skip the
        # per-image detector/embedder work that cannot change the output
        print(f"WARNING: no face detected in {args.input_image}; "
              "all scores are 0.0", file=sys.stderr)
        scores = {f: 0.0 for f in files}
    else:
        scores = {}
        for f in files:
            gen_emb = sim.face_embedding(os.path.join(args.results_dir, f))
            scores[f] = 0.0 if gen_emb is None else sim.cosine(ref_emb, gen_emb)
    mean = sum(scores.values()) / len(scores)
    if args.json:
        print(json.dumps({"scores": scores, "mean": mean,
                          "model": args.model}))
    else:
        for f, s in scores.items():
            print(f"{f:40s} {s:+.4f}")
        print(f"{'mean':40s} {mean:+.4f}")
    # console-script contract: sys.exit(main()) — a float return would make
    # every successful run exit nonzero


if __name__ == "__main__":
    main()
