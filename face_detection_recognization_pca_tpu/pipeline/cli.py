"""``fdrp`` command line: detect / train / scan / pipeline / bench.

Mirrors the reference CLIs (``--video``, ``--person``, ``--live`` of
``run_pipeline.py:156-182`` and the per-stage scripts) as subcommands of
one binary, with every hard-coded reference constant exposed through
``--config`` (JSON of :class:`..config.PipelineConfig`).
"""

from __future__ import annotations

import argparse
import json
import sys

from face_detection_recognization_pca_tpu.config import PipelineConfig


def _load_config(path) -> PipelineConfig:
    if not path:
        return PipelineConfig()
    with open(path) as f:
        return PipelineConfig.from_json(f.read())


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every CLI invocation.

    The detector's fused pyramid programs compile for minutes (remote
    TPU tunnel or the 1-core CPU here); without the cache every ``fdrp``
    run pays that again.  Same location as bench.py."""
    import jax

    from face_detection_recognization_pca_tpu.bench import cache_dir

    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(argv=None) -> int:
    _enable_compile_cache()
    p = argparse.ArgumentParser(
        prog="fdrp",
        description="TPU-native eigenfaces face detection + recognition",
    )
    p.add_argument("--config", help="PipelineConfig JSON file")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="video -> face crops + detection JSON")
    d.add_argument("--video", required=True)
    d.add_argument("--person", required=True)
    d.add_argument("--output-root", default=None)
    d.add_argument("--max-frames", type=int, default=None)
    d.add_argument(
        "--v1",
        action="store_true",
        help="v1 generation: 20px-padded 100x100 crops, "
        "{person}_face_NNNN.jpg naming, resumable ids, video metadata JSON",
    )

    t = sub.add_parser("train", help="crops -> PCA model artifacts")
    t.add_argument("--person", help="single person (train-v4 mode)")
    t.add_argument("--all", action="store_true", help="all persons (train-v5 mode)")
    t.add_argument("--lock-dir", default=None)
    t.add_argument(
        "--v1",
        action="store_true",
        help="v1 snapshot training of dark+light models from faces/{Dark,Light}_version",
    )
    t.add_argument("--base-dir", default="faces", help="v1: base faces dir")
    t.add_argument("--model-dir", default="models", help="v1: model output dir")
    t.add_argument(
        "--enhanced",
        action="store_true",
        help="multi-feature ensemble model (HOG/LBP/multi-scale + augmentation)",
    )

    s = sub.add_parser("scan", help="recognize faces in video/live stream")
    s.add_argument("--video", help="video path (guided mode with --person)")
    s.add_argument("--person", help="guided scan against this person's model")
    s.add_argument(
        "--live",
        action="store_true",
        help="webcam scan: guided single-person mode with --person, "
        "multi-model (v4) mode without",
    )
    s.add_argument("--multi", action="store_true", help="multi-model scan on --video")
    s.add_argument(
        "--batched",
        action="store_true",
        help="with --multi: frame-batched detection + size-grouped PCA "
        "verification (TPU throughput mode; same records)",
    )
    s.add_argument(
        "--batch-frames",
        type=int,
        default=None,
        help="frames per device batch for --batched",
    )
    s.add_argument(
        "--haar-multi",
        action="store_true",
        help="Haar detection + all-model verification (v3 mode)",
    )
    s.add_argument(
        "--tracked",
        action="store_true",
        help="batched tracker path on --video with --person (TPU throughput mode)",
    )
    s.add_argument(
        "--enhanced",
        action="store_true",
        help="enhanced ensemble scan on --video with --person",
    )
    s.add_argument(
        "--dual",
        nargs="+",
        metavar="MODEL_PKL",
        help="v1 dual dark/light scan with these model pickles",
    )
    s.add_argument(
        "--template-detect",
        action="store_true",
        help="with --dual: detect by full-frame multi-template TM_CCOEFF "
        "(scales 0.5-1.6, <=10 templates/dir under --faces-dir) instead of Haar",
    )
    s.add_argument(
        "--faces-dir",
        default="faces",
        help="template source directory for --template-detect",
    )
    s.add_argument("--output", default=None)
    s.add_argument("--lock-dir", default=None)
    s.add_argument("--max-frames", type=int, default=None)

    r = sub.add_parser("pipeline", help="detect -> train -> recognize")
    r.add_argument("--video")
    r.add_argument("--person", required=True)
    r.add_argument("--live", action="store_true")
    r.add_argument("--max-frames", type=int, default=None)
    r.add_argument("--no-scan", action="store_true")

    g = sub.add_parser(
        "gen-json",
        help="backfill detection JSONs from bare crop directories "
        "(the reference's standalone generate_detection_json.py)",
    )
    g.add_argument("--lock-dir", default=None)
    g.add_argument("--person", help="one person only (default: all dirs)")
    g.add_argument(
        "--force",
        action="store_true",
        help="regenerate even when the JSON already exists "
        "(the reference skips existing files)",
    )

    e = sub.add_parser("eval", help="top-1 accuracy on a holdout split")
    e.add_argument("--lock-dir", default="faces/lock_version")
    e.add_argument("--holdout-every", type=int, default=5)
    e.add_argument("--components", type=int, default=100)
    e.add_argument("--max-per-person", type=int, default=None)

    b = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    b.add_argument("--streams", type=int, default=8)
    b.add_argument("--frames", type=int, default=64)
    b.add_argument("--size", default="1080p", choices=["1080p", "720p", "544p"])

    args = p.parse_args(argv)
    cfg = _load_config(args.config)

    if args.cmd == "detect":
        from face_detection_recognization_pca_tpu.pipeline.detect_app import (
            detect_video,
            detect_video_v1,
        )

        if args.v1:
            meta = detect_video_v1(
                args.video,
                args.output_root or cfg.paths.faces_root,
                args.person,
                config=cfg,
                max_frames=args.max_frames,
            )
            print(json.dumps({"faces": len(meta["faces"])}))
            return 0
        det = detect_video(
            args.video,
            args.person,
            output_root=args.output_root,
            config=cfg,
            max_frames=args.max_frames,
        )
        print(json.dumps({"faces": det.total_faces_detected, "frames": det.total_frames}))
        return 0

    if args.cmd == "train":
        from face_detection_recognization_pca_tpu.pipeline.train_app import (
            train_all_persons,
            train_single_person,
        )

        if args.v1:
            from face_detection_recognization_pca_tpu.pipeline.v1_apps import (
                train_v1_versions,
            )

            paths = train_v1_versions(
                args.person or "Joseph_Lai",
                base_faces_dir=args.base_dir,
                model_dir=args.model_dir,
                n_components=cfg.train.n_components,
            )
            print(json.dumps({"models": paths}))
        elif args.enhanced:
            import cv2

            from face_detection_recognization_pca_tpu.models.enhanced import (
                save_enhanced,
                train_enhanced,
            )
            from face_detection_recognization_pca_tpu.pipeline.train_app import (
                _load_person_vectors,  # reuse JSON-driven crop listing
            )

            if not args.person:
                p.error("--enhanced needs --person")
            import os

            lock = args.lock_dir or cfg.paths.lock_dir
            pdir = os.path.join(lock, args.person)
            _, info = _load_person_vectors(pdir, args.person, (64, 64))
            crops = []
            for rec in info:
                path = rec["image_path"]
                if not os.path.exists(path):
                    path = os.path.join(pdir, os.path.basename(path.replace("\\", "/")))
                img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    crops.append(img)
            model = train_enhanced(
                crops, [0] * len(crops), {args.person: 0}
            )
            out = os.path.join(pdir, "enhanced_model.pkl")
            save_enhanced(model, out)
            print(json.dumps({"model": out, "crops": len(crops)}))
        elif args.all:
            arts = train_all_persons(args.lock_dir, cfg)
            print(json.dumps({k: a.n_components for k, a in arts.items()}))
        elif args.person:
            art = train_single_person(args.person, args.lock_dir, cfg)
            print(
                json.dumps(
                    {
                        "person": args.person,
                        "n_components": art.n_components,
                        "n_faces": int(art.features.shape[0]),
                    }
                )
            )
        else:
            p.error("train needs --person or --all")
        return 0

    if args.cmd == "scan":
        from face_detection_recognization_pca_tpu.pipeline.scan_app import (
            scan_multimodel,
            scan_video_guided,
        )

        if args.dual:
            from face_detection_recognization_pca_tpu.pipeline.v1_apps import (
                scan_dual,
            )

            detector = None
            if args.template_detect:
                from face_detection_recognization_pca_tpu.detect.ccoeff import (
                    CcoeffTemplateDetector,
                )

                detector = CcoeffTemplateDetector.from_faces_dir(
                    args.faces_dir
                )
            out = scan_dual(
                args.video,
                args.dual,
                output_dir=args.output or cfg.paths.output_dir,
                config=cfg,
                detector=detector,
                max_frames=args.max_frames,
            )
            print(json.dumps(out))
            return 0
        if args.tracked:
            from face_detection_recognization_pca_tpu.pipeline.tracked_scan import (
                scan_video_tracked,
            )

            if not (args.video and args.person):
                p.error("--tracked needs --video and --person")
            results = scan_video_tracked(
                args.video,
                args.person,
                args.lock_dir,
                output_json=args.output,
                config=cfg,
                max_frames=args.max_frames,
            )
            print(json.dumps({"recognitions": len(results)}))
            return 0
        if args.enhanced:
            from face_detection_recognization_pca_tpu.pipeline.scan_app import (
                scan_enhanced_video,
            )

            if not (args.video and args.person):
                p.error("--enhanced needs --video and --person")
            results = scan_enhanced_video(
                args.video,
                args.person,
                args.lock_dir,
                args.output,
                cfg,
                args.max_frames,
            )
            print(json.dumps({"recognitions": len(results)}))
            return 0
        if args.haar_multi:
            from face_detection_recognization_pca_tpu.pipeline.scan_app import (
                scan_haar_multimodel,
            )

            results = scan_haar_multimodel(
                args.video, args.lock_dir, args.output, cfg, args.max_frames
            )
        elif args.live and args.person:
            # --live --person = guided live mode (scripts/manual/
            # run_pipeline.py:242 passes these to scan-template-v2).
            from face_detection_recognization_pca_tpu.pipeline.scan_app import (
                scan_live_guided,
            )

            results = scan_live_guided(
                args.person,
                lock_dir=args.lock_dir,
                output_path=args.output,
                config=cfg,
                max_frames=args.max_frames,
            )
        elif args.live:
            results = scan_multimodel(
                0, args.lock_dir, args.output, cfg, args.max_frames
            )
        elif args.multi and args.batched:
            from face_detection_recognization_pca_tpu.pipeline.scan_app import (
                scan_multimodel_batched,
            )

            results = scan_multimodel_batched(
                args.video,
                args.lock_dir,
                args.output,
                cfg,
                args.max_frames,
                batch_frames=args.batch_frames,
            )
        elif args.multi:
            results = scan_multimodel(
                args.video, args.lock_dir, args.output, cfg, args.max_frames
            )
        elif args.video and args.person:
            results = scan_video_guided(
                args.video,
                args.person,
                args.lock_dir,
                args.output,
                cfg,
                args.max_frames,
            )
        else:
            p.error("scan needs --live, or --video with --person/--multi")
        print(json.dumps({"recognitions": len(results)}))
        return 0

    if args.cmd == "pipeline":
        from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
            run_pipeline,
        )

        out = run_pipeline(
            args.person,
            video_path=args.video,
            live=args.live,
            config=cfg,
            max_frames=args.max_frames,
            scan=not args.no_scan,
        )
        print(json.dumps(out))
        return 0

    if args.cmd == "gen-json":
        # Standalone detection-JSON backfill, reference
        # generate_detection_json.py:119-155: scan person dirs under the
        # lock root, skip dirs whose JSON already exists (unless
        # --force), write the 12-field schema with x=y=0 and 30 fps.
        import os

        from face_detection_recognization_pca_tpu.io.detection_json import (
            generate_detection_json,
        )

        lock = args.lock_dir or cfg.paths.lock_dir
        if not os.path.isdir(lock):
            p.error(f"directory {lock} not found")
        persons = (
            [args.person]
            if args.person
            else sorted(
                d
                for d in os.listdir(lock)
                if os.path.isdir(os.path.join(lock, d))
            )
        )
        generated, skipped = [], []
        for name in persons:
            pdir = os.path.join(lock, name)
            jpath = os.path.join(pdir, f"{name}_faces_detection.json")
            if os.path.exists(jpath) and not args.force:
                skipped.append(jpath)
                continue
            det = generate_detection_json(pdir, name, output_path=jpath)
            generated.append({"path": jpath, "faces": det.total_faces_detected})
        print(json.dumps({"generated": generated, "skipped": skipped}))
        return 0

    if args.cmd == "eval":
        from face_detection_recognization_pca_tpu.pipeline.eval_app import (
            holdout_eval,
        )

        stats = holdout_eval(
            args.lock_dir,
            holdout_every=args.holdout_every,
            n_components=args.components,
            max_per_person=args.max_per_person,
            config=cfg,
        )
        print(json.dumps(stats))
        return 0

    if args.cmd == "bench":
        from face_detection_recognization_pca_tpu.bench import run_bench

        print(json.dumps(run_bench(args.streams, args.frames, args.size)))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
