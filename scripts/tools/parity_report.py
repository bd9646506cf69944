#!/usr/bin/env python3
"""One-command BASELINE quality-parity protocol (VERDICT r04 next #3).

The last unmet BASELINE clause — "FFHQ rFID within 1% of reference"
(`/root/reference/README.md:125-127`: 1.6968 on ImageNet val) — is blocked on
externals this zero-egress host cannot fetch: real dataset images, a real
reference `.ckpt`, and InceptionV3 weights. This script turns that block into
a single command for the day those are mounted: it runs the WHOLE protocol
and emits one JSON verdict.

Legs (each recorded with status ran/skipped + numbers):
  1. ckpt_import     — load the reference torch `.ckpt` into our DQ-VAE
                       (utils/torch_ckpt key mapping); reports mapped-leaf
                       count; fails on unmapped model parameters.
  2. recon_tolerance — run the ACTUAL reference torch model (repo path from
                       --reference_repo, default /root/reference) and ours on
                       the same batches; reports max|diff| / MSE of
                       reconstructions; pass iff max|diff| < --tolerance.
  3. rfid            — reconstruct the provided image tree; FID(originals,
                       reconstructions) over InceptionV3 pool3 features
                       (bundled torch trunk, `eval/inception_torch.py` —
                       torchvision itself is NOT needed, only the weights
                       file). Verdict: within --rfid_rel_tol (default 1%) of
                       --rfid_reference (default 1.6968).
  4. sample_fid      — optional: with --stage2_yaml/--stage2_ckpt, sample
                       --sample_num images through the KV-cached sampler and
                       report FID(samples, image tree).

Inputs (all optional; missing ones mark their leg "skipped" with the reason):
  DQVQ_INCEPTION_WEIGHTS  torchvision inception_v3 state_dict (.pth)
  --ref_ckpt              reference stage-1 `.ckpt`
  --images                image tree (e.g. FFHQ/ImageNet val)
  --stage2_ckpt           reference stage-2 `.ckpt` (or our orbax dir)

CI exercises this end-to-end with synthesized stand-ins
(`tests/test_parity_report.py`): a fake torch `.ckpt` exported from our own
random-init model, a random-weight inception state_dict, and a synthetic
image tree — every leg's code path runs; only the verdict thresholds need
real files.

Usage (the weights-mounted day):
  DQVQ_INCEPTION_WEIGHTS=/weights/inception_v3.pth \\
  python scripts/tools/parity_report.py \\
      --yaml_path configs/stage1/dqvae-entropy-dual-r05_imagenet.yml \\
      --ref_ckpt /ckpts/imagenet_dual_r05.ckpt \\
      --images $DQVQ_IMAGENET_ROOT/val --out parity_report.json
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[parity {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _iter_images(path, batch_size, limit, size):
    sys.path.insert(0, os.path.join(REPO, "scripts", "tools"))
    from compute_fid import iter_source

    return iter_source(path, batch_size=batch_size, limit=limit, size=size)


def leg_ckpt_import(opt, report):
    """Reference `.ckpt` -> our variables; counts mapped leaves."""
    import jax
    import numpy as np

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import (
        instantiate_from_config,
    )
    from dynamicvectorquantization_tpu.utils.model_loading import (
        load_first_stage_variables,
    )

    config = load_config([opt.yaml_path], [])
    model = instantiate_from_config(config["model"])
    if not opt.ref_ckpt:
        report["ckpt_import"] = {"status": "skipped", "reason": "--ref_ckpt not given"}
        variables = model.init(jax.random.PRNGKey(0))
        return model, variables
    model.ckpt_path = opt.ref_ckpt
    variables = load_first_stage_variables(model)
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    n_params = int(
        sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(variables))
    )
    report["ckpt_import"] = {
        "status": "ran",
        "ckpt": opt.ref_ckpt,
        "mapped_leaves": n_leaves,
        "parameters": n_params,
    }
    log(f"ckpt_import: {n_leaves} leaves / {n_params} params from {opt.ref_ckpt}")
    return model, variables


def leg_recon_tolerance(opt, report, model, variables):
    """Our recon vs the actual reference torch model on identical batches."""
    if not (opt.ref_ckpt and opt.images):
        report["recon_tolerance"] = {
            "status": "skipped",
            "reason": "needs --ref_ckpt and --images",
        }
        return
    if not os.path.isdir(opt.reference_repo):
        report["recon_tolerance"] = {
            "status": "skipped",
            "reason": f"reference repo not found at {opt.reference_repo}",
        }
        return
    import numpy as np
    import torch
    import jax

    # import the reference model classes (stubbing its heavyweight deps the
    # same way tests/test_reference_parity.py does)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_reference_parity import _install_stubs

    _install_stubs()
    if opt.reference_repo not in sys.path:
        sys.path.insert(0, opt.reference_repo)
    import importlib

    from dynamicvectorquantization_tpu.config.yaml_config import load_config

    config = load_config([opt.yaml_path], [])
    target = config["model"]["target"]
    mod_name, cls_name = target.rsplit(".", 1)
    ref_cls = getattr(importlib.import_module(mod_name), cls_name)
    params = dict(config["model"]["params"])
    params.pop("ckpt_path", None)
    # strip keys that are OUR extensions of the shared YAML schema before
    # handing the params to the reference constructors (which reject
    # unknown kwargs): TPU-kernel toggles and the router's direct
    # threshold override
    for sub in ("vqconfig",):
        if isinstance(params.get(sub), dict):
            params[sub] = dict(params[sub])
            sp = dict(params[sub].get("params") or {})
            sp.pop("use_pallas", None)
            params[sub]["params"] = sp
    # recon needs no loss module; DummyLoss sidesteps the reference LPIPS
    # init (torchvision VGG16 download) entirely
    params["lossconfig"] = {"target": "modules.losses.vqperceptual.DummyLoss"}
    ref_model = ref_cls(**params)
    sd = torch.load(opt.ref_ckpt, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    ref_model.load_state_dict(sd, strict=False)
    ref_model.eval()

    fwd = jax.jit(lambda v, x: model.net.apply(v, x)[0])
    max_diff, mse, n = 0.0, 0.0, 0
    for b in _iter_images(opt.images, opt.batch_size, opt.recon_images, opt.size):
        ours = np.asarray(fwd(variables, b))
        with torch.no_grad():
            theirs = ref_model(torch.from_numpy(b).permute(0, 3, 1, 2))
            if isinstance(theirs, tuple):
                theirs = theirs[0]
            theirs = theirs.permute(0, 2, 3, 1).numpy()
        max_diff = max(max_diff, float(np.abs(ours - theirs).max()))
        mse += float(((ours - theirs) ** 2).mean()) * len(b)
        n += len(b)
    ok = max_diff < opt.tolerance
    report["recon_tolerance"] = {
        "status": "ran",
        "images": n,
        "max_abs_diff": max_diff,
        "mse": mse / max(n, 1),
        "tolerance": opt.tolerance,
        "pass": bool(ok),
    }
    log(f"recon_tolerance: max|diff|={max_diff:.3e} over {n} images "
        f"({'PASS' if ok else 'FAIL'} at {opt.tolerance})")


def _feature_fn(opt, report_key, report):
    if opt.proxy_features:
        sys.path.insert(0, os.path.join(REPO, "scripts", "tools"))
        from compute_fid import proxy_feature_fn

        report[report_key] = "proxy (plumbing-grade; NOT comparable to FID)"
        return proxy_feature_fn(), True
    from dynamicvectorquantization_tpu.eval.fid import inception_feature_fn

    fn = inception_feature_fn()  # raises without weights
    report[report_key] = (
        f"inception_v3 pool3 ({os.environ.get('DQVQ_INCEPTION_WEIGHTS')})"
    )
    return fn, False


def leg_rfid(opt, report, model, variables):
    if not opt.images:
        report["rfid"] = {"status": "skipped", "reason": "--images not given"}
        return
    import numpy as np
    import jax

    from dynamicvectorquantization_tpu.eval.fid import fid_between

    try:
        feature_fn, is_proxy = _feature_fn(opt, "feature_extractor", report)
    except FileNotFoundError as e:
        report["rfid"] = {"status": "skipped", "reason": str(e)}
        return
    fwd = jax.jit(lambda v, x: model.net.apply(v, x)[0])
    orig, recon = [], []
    for b in _iter_images(opt.images, opt.batch_size, opt.limit, opt.size):
        orig.append(b)
        recon.append(np.asarray(fwd(variables, b)))
    value = fid_between(orig, recon, feature_fn)
    entry = {
        "status": "ran",
        "images": int(sum(len(b) for b in orig)),
        "value": round(float(value), 4),
        "metric": "proxy_rfid" if is_proxy else "rfid",
    }
    if not is_proxy and opt.ref_ckpt:
        rel = abs(value - opt.rfid_reference) / opt.rfid_reference
        entry.update({
            "reference": opt.rfid_reference,
            "rel_diff": round(float(rel), 4),
            "pass": bool(rel <= opt.rfid_rel_tol),
        })
        log(f"rfid: {value:.4f} vs reference {opt.rfid_reference} "
            f"(rel {rel:.2%}, {'PASS' if rel <= opt.rfid_rel_tol else 'FAIL'})")
    else:
        log(f"rfid ({entry['metric']}): {value:.4f}")
    report["rfid"] = entry


def leg_sample_fid(opt, report):
    if not (opt.stage2_yaml and opt.stage2_ckpt and opt.images):
        report["sample_fid"] = {
            "status": "skipped",
            "reason": "needs --stage2_yaml, --stage2_ckpt and --images",
        }
        return
    import subprocess
    import tempfile

    sdir = opt.sample_dir or tempfile.mkdtemp(prefix="parity_samples_")
    cmd = [
        sys.executable, os.path.join(REPO, "scripts/sample_val/sample_dynamic_uncond.py"),
        "--yaml_path", opt.stage2_yaml, "--model_path", opt.stage2_ckpt,
        "--save_path", sdir, "--batch_size", str(opt.batch_size),
        "--sample_num", str(opt.sample_num),
        "--top_k", "300", "--top_k_pos", "1024",
    ]
    log("sampling: " + " ".join(cmd))
    subprocess.run(cmd, check=True, cwd=REPO)
    try:
        feature_fn, is_proxy = _feature_fn(opt, "sample_feature_extractor", report)
    except FileNotFoundError as e:
        report["sample_fid"] = {"status": "skipped", "reason": str(e)}
        return
    from dynamicvectorquantization_tpu.eval.fid import fid_between

    a = _iter_images(os.path.join(sdir, "numpys"), opt.batch_size, None, opt.size)
    b = _iter_images(opt.images, opt.batch_size, opt.limit, opt.size)
    value = fid_between(a, b, feature_fn)
    report["sample_fid"] = {
        "status": "ran",
        "samples": opt.sample_num,
        "value": round(float(value), 4),
        "metric": "proxy_fid" if is_proxy else "fid",
    }
    log(f"sample_fid ({report['sample_fid']['metric']}): {value:.4f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yaml_path", required=True, help="stage-1 config YAML")
    p.add_argument("--ref_ckpt", default=None, help="reference stage-1 .ckpt")
    p.add_argument("--images", default=None, help="image tree (val set)")
    p.add_argument("--stage2_yaml", default=None)
    p.add_argument("--stage2_ckpt", default=None)
    p.add_argument("--sample_num", type=int, default=5000)
    p.add_argument("--sample_dir", default=None)
    p.add_argument("--reference_repo", default="/root/reference")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None, help="cap rFID images")
    p.add_argument("--recon_images", type=int, default=32,
                   help="images for the recon-tolerance leg")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--tolerance", type=float, default=5e-3,
                   help="recon max|diff| tolerance (f32 conv accumulation "
                        "order differs across frameworks)")
    p.add_argument("--rfid_reference", type=float, default=1.6968,
                   help="reference rFID (README.md:125-127)")
    p.add_argument("--rfid_rel_tol", type=float, default=0.01)
    p.add_argument("--proxy_features", action="store_true",
                   help="CI mode: random-projection features (plumbing only)")
    p.add_argument("--out", default="parity_report.json")
    opt = p.parse_args()

    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    report = {"argv": sys.argv[1:], "t_start": time.time()}
    model, variables = leg_ckpt_import(opt, report)
    leg_recon_tolerance(opt, report, model, variables)
    leg_rfid(opt, report, model, variables)
    leg_sample_fid(opt, report)

    ran = [k for k in ("ckpt_import", "recon_tolerance", "rfid", "sample_fid")
           if report.get(k, {}).get("status") == "ran"]
    failed = [k for k in ran if report[k].get("pass") is False]
    skipped = [k for k in ("ckpt_import", "recon_tolerance", "rfid", "sample_fid")
               if report.get(k, {}).get("status") == "skipped"]
    report["verdict"] = (
        "FAIL" if failed else ("INCOMPLETE" if skipped else "PASS")
    )
    report["legs_ran"] = ran
    report["legs_skipped"] = {
        k: report[k]["reason"] for k in skipped
    }
    report["t_seconds"] = round(time.time() - report["t_start"], 1)
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"verdict": report["verdict"], "ran": ran,
                      "skipped": skipped, "out": opt.out}))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
