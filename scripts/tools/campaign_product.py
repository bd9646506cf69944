#!/usr/bin/env python3
"""Campaign v2 — a two-stage convergence run THROUGH THE PRODUCT STACK.

VERDICT r03 #4: the r03 10k-step campaign drove Stage1Trainer/Stage2Trainer
directly on in-memory pools, bypassing `train.py`, `data/pipeline.py`, and
the native libjpeg loader. This campaign rehearses the real-ImageNet day
end to end with the shipped commands:

  1. JPEG-encode a synthetic pool to disk as an ImageNet-layout tree
     (<root>/{train,val}/<class>/*.jpg) — the product datasets and the
     native DCT-downscale decoder (`native/host_pipeline.cpp`) then serve it.
  2. Compute the entropy-threshold percentile table with the product
     offline tool (`calculate_entropy_thresholds.py`), as a user would for
     a new dataset.
  3. Train stage 1 via `train.py` (full GAN step, orbax top-k checkpoints).
  4. Train stage 2 via `train.py` — the shipped fast defaults: cached-codes
     + flash + bf16 + auto dispatch scan. Permuter capacity is pinned to
     the r=0.5 regime (coarse 160 / fine 644, the benched geometry).
  5. Sample from every retained stage-2 checkpoint and track
     `proxy_fid(samples, val set)` (`compute_fid.py --proxy_features` —
     plumbing-grade metric, monotone in distribution distance; see that
     tool's docstring) so sample quality is MEASURED, not eyeballed.
  6. Summarize: per-log-row images/sec series (loader starvation would show
     as rate sag), cache-encode seconds, best-val checkpoint retention,
     proxy_fid trajectory -> <out>/summary.json.

Usage (the r04 artifact run):
  python3 scripts/tools/campaign_product.py --out artifacts/campaign_r04 \
      --train_images 3072 --val_images 256 --s1_epochs 6 --s2_epochs 6
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_jpeg_tree(root, n_train, n_val, n_classes, size, seed, quality=95):
    from PIL import Image

    from dynamicvectorquantization_tpu.data.synthetic import build_pool

    t0 = time.time()
    for split, n, sd in (("train", n_train, seed), ("val", n_val, seed + 999)):
        pool = build_pool(n, size, seed=sd)
        for i in range(n):
            cls = i % n_classes
            d = os.path.join(root, split, f"cls_{cls:03d}")
            os.makedirs(d, exist_ok=True)
            Image.fromarray(pool[i]).save(
                os.path.join(d, f"img_{i:05d}.jpg"), quality=quality
            )
    log(f"JPEG tree: {n_train}+{n_val} images in {time.time()-t0:.0f}s -> {root}")


def run(cmd, env_extra=None, tag="", resume_glob=None, retries=2):
    """Run a leg; on failure of a train.py leg, retry with --resume into the
    run dir it started (the axon TPU tunnel drops transiently — r04 saw
    `remote_compile: response body closed` mid-campaign; orbax checkpoints +
    --resume make the leg idempotent)."""
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    attempt_cmd = list(cmd)
    for attempt in range(retries + 1):
        log(f"run[{tag}]{f' (retry {attempt})' if attempt else ''}: "
            + " ".join(attempt_cmd))
        p = subprocess.run(attempt_cmd, env=env, cwd=REPO)
        if p.returncode == 0:
            dt = time.time() - t0
            log(f"done[{tag}] in {dt:.0f}s")
            return dt
        if attempt == retries or not resume_glob:
            raise SystemExit(f"{tag} failed with {p.returncode}")
        dirs = sorted(glob.glob(resume_glob))
        if not dirs:
            log(f"{tag} failed ({p.returncode}); no run dir yet — rerunning")
            continue
        rundir = dirs[-1]
        log(f"{tag} failed ({p.returncode}); resuming {rundir}")
        # strip --name/--logdir (resume re-derives them) and dotlist stays
        base = [a for i, a in enumerate(cmd) if not (
            a in ("--name", "--logdir")
            or (i > 0 and cmd[i - 1] in ("--name", "--logdir")))]
        attempt_cmd = base + ["--resume", rundir]


def read_metrics(logdir):
    rows = []
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for ln in f:
            rows.append(json.loads(ln))
    return rows


def rate_stats(rows):
    rates = [r["images_per_sec"] for r in rows
             if r["split"] == "train" and "images_per_sec" in r]
    if not rates:
        return {}
    import numpy as np

    a = np.asarray(rates)
    return {
        "n": len(a),
        "first": round(float(a[0]), 2),
        "median": round(float(np.median(a)), 2),
        "p10": round(float(np.percentile(a, 10)), 2),
        "p90": round(float(np.percentile(a, 90)), 2),
        "last": round(float(a[-1]), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/campaign_r04")
    p.add_argument("--train_images", type=int, default=3072)
    p.add_argument("--val_images", type=int, default=256)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--s1_epochs", type=int, default=6)
    p.add_argument("--s2_epochs", type=int, default=6)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--sample_num", type=int, default=96)
    p.add_argument("--skip_data", action="store_true",
                   help="reuse an existing <out>/data tree")
    p.add_argument("--skip_s1", action="store_true")
    p.add_argument("--skip_s2", action="store_true")
    opt = p.parse_args()

    out = os.path.abspath(opt.out)
    data_root = os.path.join(out, "data")
    logroot = os.path.join(out, "logs")
    os.makedirs(out, exist_ok=True)
    env = {"DQVQ_IMAGENET_ROOT": data_root}
    # Merge into an existing summary so a skip-flag re-run (e.g. redoing
    # only the proxy_fid legs) preserves the recorded leg timings.
    summary = {}
    spath = os.path.join(out, "summary.json")
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary.update({"args": vars(opt), "t_start": time.time()})

    # 1. data
    if not opt.skip_data:
        build_jpeg_tree(data_root, opt.train_images, opt.val_images,
                        opt.classes, opt.image_size, opt.seed)

    # 2. entropy thresholds via the product offline tool
    thr_dir = os.path.join(out, "thresholds")
    thr_json = os.path.join(
        thr_dir, "entropy_thresholds_imagenet_train_patch-16.json")
    if os.path.exists(thr_json):
        log(f"thresholds: reusing {thr_json}")
    else:
        run([sys.executable, "scripts/tools/calculate_entropy_thresholds.py",
             "--dataset", "imagenet", "--split", "train",
             "--image_size", str(opt.image_size), "--out_dir", thr_dir],
            env, "thresholds")
    assert os.path.exists(thr_json)

    # 3. stage 1 through train.py
    common_data = [
        f"data.params.batch_size={opt.batch_size}",
        "data.params.num_workers=2",
    ]
    if not opt.skip_s1:
        summary["s1_seconds"] = run(
            [sys.executable, "train.py",
             "--base", "configs/stage1/dqvae-entropy-dual-r05_imagenet.yml",
             "--max_epochs", str(opt.s1_epochs), "--name", "s1",
             "--logdir", logroot, "--log_every", "8",
             "--steps_per_dispatch", "4", "--seed", str(opt.seed),
             "model.params.encoderconfig.params.router_config.params."
             f"json_path={thr_json}",
             ] + common_data,
            env, "stage1",
            resume_glob=os.path.join(logroot, "s1-*"))
    s1_dir = sorted(glob.glob(os.path.join(logroot, "s1-*")))[-1]
    s1_ckpts = os.path.join(s1_dir, "checkpoints")
    s1_rows = read_metrics(s1_dir)
    summary["s1_rate"] = rate_stats(s1_rows)
    summary["s1_val"] = [
        {"step": r["step"], "val_rec_loss": r.get("val_rec_loss")}
        for r in s1_rows if r["split"] == "val"
    ]

    # 4. stage 2 through train.py (shipped fast defaults: cached-codes +
    #    flash + bf16; permuter capacity = the benched r=0.5 regime)
    if not opt.skip_s2:
        summary["s2_seconds"] = run(
            [sys.executable, "train.py",
             "--base", "configs/stage2/uncond_imagenet_p6c18.yml",
             "--max_epochs", str(opt.s2_epochs), "--name", "s2",
             "--logdir", logroot, "--log_every", "8", "--seed", str(opt.seed),
             # one grid per epoch: each image-log event SAMPLES (2 sampler
             # programs + decode) and costs ~150 s over the axon tunnel even
             # jit-cached — at the reference's default 50-step cadence that
             # would dwarf the training itself on this host
             "--image_log_every", "384",
             "model.params.first_stage_config.params."
             f"ckpt_path={s1_ckpts}",
             "model.params.first_stage_config.params.encoderconfig.params."
             f"router_config.params.json_path={thr_json}",
             "model.params.permuter_config.params.coarse_max_len=160",
             "model.params.permuter_config.params.fine_max_len=644",
             ] + common_data,
            env, "stage2",
            resume_glob=os.path.join(logroot, "s2-*"))
    s2_dir = sorted(glob.glob(os.path.join(logroot, "s2-*")))[-1]
    s2_rows = read_metrics(s2_dir)
    summary["s2_rate"] = rate_stats(s2_rows)
    summary["s2_cache_encode_seconds"] = [
        r["cache_encode_seconds"] for r in s2_rows
        if "cache_encode_seconds" in r
    ]
    vals = [(r["step"], r["val_loss"]) for r in s2_rows if r["split"] == "val"]
    summary["s2_val"] = [{"step": s, "val_loss": v} for s, v in vals]

    # best-val retention: the checkpoint manager must keep the best-val step
    kept = sorted(
        int(d) for d in os.listdir(os.path.join(s2_dir, "checkpoints"))
        if d.isdigit()
    )
    best_step = min(vals, key=lambda sv: sv[1])[0] if vals else None
    summary["s2_checkpoints_kept"] = kept
    summary["s2_best_val_step"] = best_step
    summary["s2_best_val_retained"] = best_step in kept

    # 5. sample every retained checkpoint, track proxy_fid vs the val tree
    merged_yaml = os.path.join(s2_dir, "configs", "merged-project.yaml")
    fid_curve = []
    for step in kept:
        ck = os.path.join(s2_dir, "checkpoints", str(step))
        sdir = os.path.join(out, "samples", f"step_{step}")
        if glob.glob(os.path.join(sdir, "numpys", "*")):
            log(f"sample@{step}: reusing existing {sdir}")
        else:
            run([sys.executable, "scripts/sample_val/sample_dynamic_uncond.py",
             "--yaml_path", merged_yaml, "--model_path", ck,
             "--save_path", sdir, "--batch_size", "32",
             "--sample_num", str(opt.sample_num),
             "--top_k", "300", "--top_k_pos", "1024", "--save_grids"],
                env, f"sample@{step}")
        r = subprocess.run(
            [sys.executable, "scripts/tools/compute_fid.py",
             "--a", os.path.join(sdir, "numpys"),
             "--b", os.path.join(data_root, "val"),
             "--proxy_features"],
            env={**os.environ, **env}, cwd=REPO,
            capture_output=True, text=True)
        fid = None
        for ln in reversed(r.stdout.strip().splitlines()):
            try:
                obj = json.loads(ln)
            except json.JSONDecodeError:
                continue
            # compute_fid prints {"metric": "proxy_fid", "value": N}
            fid = obj.get("value") if obj.get("metric") == "proxy_fid" \
                else obj.get("proxy_fid")
            break
        log(f"proxy_fid@{step}: {fid}")
        fid_curve.append({"step": step, "proxy_fid": fid})
    summary["s2_sample_proxy_fid"] = fid_curve

    summary["t_total_seconds"] = round(time.time() - summary["t_start"], 0)
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    _plot_curves(out, s1_rows, s2_rows, summary)
    # keep a small committable copy of the run logs next to summary.json
    # (the raw log dirs hold multi-GB orbax checkpoints and stay untracked)
    import shutil

    for tag, d in (("stage1", s1_dir), ("stage2", s2_dir)):
        for n in ("metrics.jsonl", "argv.json"):
            src = os.path.join(d, n)
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(out, f"{tag}_{n}"))
    log("summary written: " + os.path.join(out, "summary.json"))
    print(json.dumps(summary, indent=1))


def _plot_curves(out, s1_rows, s2_rows, summary):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    def series(rows, split, key):
        sel = [(r["step"], r[key]) for r in rows
               if r["split"] == split and r.get(key) is not None]
        return ([s for s, _ in sel], [v for _, v in sel])

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    ax = axes[0, 0]
    ax.plot(*series(s1_rows, "train", "train_rec_loss"), label="train_rec_loss")
    ax.plot(*series(s1_rows, "val", "val_rec_loss"), "--o", ms=3,
            label="val_rec_loss")
    ax.set_xlabel("step"); ax.set_title("stage-1 reconstruction"); ax.legend(fontsize=8)
    ax = axes[0, 1]
    ax.plot(*series(s1_rows, "train", "images_per_sec"), label="s1 images/sec")
    ax.set_xlabel("step"); ax.set_title("stage-1 rate (product loader)")
    ax.legend(fontsize=8)
    ax = axes[0, 2]
    ax.plot(*series(s1_rows, "train", "train_fine_ratio"), label="fine_ratio")
    ax.set_xlabel("step"); ax.set_title("dual-grain routing"); ax.legend(fontsize=8)
    ax = axes[1, 0]
    ax.plot(*series(s2_rows, "train", "train_loss"), label="train_loss")
    ax.plot(*series(s2_rows, "val", "val_loss"), "--o", ms=3, label="val_loss")
    ax.set_xlabel("step"); ax.set_title("stage-2 loss"); ax.legend(fontsize=8)
    ax = axes[1, 1]
    ax.plot(*series(s2_rows, "train", "images_per_sec"), label="s2 images/sec")
    ax.set_xlabel("step"); ax.set_title("stage-2 rate (cached codes)")
    ax.legend(fontsize=8)
    ax = axes[1, 2]
    fid = [r for r in summary.get("s2_sample_proxy_fid", [])
           if r.get("proxy_fid") is not None]
    if fid:
        ax.plot([r["step"] for r in fid], [r["proxy_fid"] for r in fid],
                "-o", ms=4, label="proxy_fid(samples, val)")
        ax.set_xlabel("checkpoint step"); ax.set_title("sample quality proxy")
        ax.legend(fontsize=8)
    fig.suptitle("Campaign v2 — both stages through train.py + product data "
                 "pipeline (synthetic ImageNet-layout JPEG tree)")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "curves.png"), dpi=110)
    plt.close(fig)


if __name__ == "__main__":
    main()
