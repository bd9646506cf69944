"""Shared xplane-trace analysis for the profile_* tools.

Parses a jax.profiler xplane dump directly via the tensorflow.tsl protos
(the tensorboard_plugin_profile converter needs a protoc/pywrap pairing this
image doesn't ship) and prints self-time rankings by hlo_category, op
family, individual op, and — when a compiled HLO text is supplied — by
fusion root op, so the generic "fusion" bucket decomposes into what the
elementwise work actually IS.
"""
import collections
import glob
import json
import os
import re
import sys


def fusion_roots_from_hlo(txt):
    """Map fusion instruction names -> 'rootop[+conv|+dot] shape' using the
    compiled module text (computation bodies are `%fused_computation[.N]`;
    the calling instruction states calls=<computation>).

    The +conv/+dot markers flag computations whose BODY contains a
    convolution/dot: on TPU, XLA buries MXU work inside fusions whose root
    is an elementwise/reduce op, so a root-only reading badly misattributes
    time (r04 lesson: the encode path's 'convert_reduce' fusions that looked
    like GroupNorm stats actually carried the conv MXU time — a GroupNorm
    rewrite measured exactly neutral)."""
    comp_root = {}
    comp_mxu = {}
    cur = None
    for ln in txt.splitlines():
        # computation headers may carry an `ENTRY ` prefix; match it so
        # ENTRY's ROOT doesn't get attributed to the previous computation
        m = re.match(r"(?:ENTRY )?%?([\w.-]+) \(", ln.strip())
        if ln and not ln.startswith(" ") and "{" in ln and m:
            cur = m.group(1)
        if ln and not ln.startswith(" ") and ln.strip() == "}":
            cur = None  # computation closed; ignore stray ROOT lines
        s = ln.strip()
        if cur and re.search(r"= \S+ convolution\(", s):
            comp_mxu[cur] = comp_mxu.get(cur, "") or "+conv"
        elif cur and re.search(r"= \S+ dot\(", s):
            comp_mxu.setdefault(cur, "+dot")
        if s.startswith("ROOT ") and cur:
            mm = re.match(r"ROOT %?[\w.-]+ = \S+ ([\w-]+)", s)
            if mm:
                comp_root[cur] = mm.group(1)
    roots = {}
    for mm in re.finditer(
        r"%?([\w.-]*fusion[\w.-]*) = (\S+) fusion\(.*?calls=%?([\w.-]+)", txt
    ):
        comp = mm.group(3)
        roots[mm.group(1)] = (
            f"{comp_root.get(comp, '?')}{comp_mxu.get(comp, '')} {mm.group(2)}"
        )
    return roots


def analyze(logdir, fusion_roots=None, min_step_ms=1.0):
    """Find the newest xplane under logdir and print the op-time report."""
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured", "logdir": logdir}))
        return
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"xplane: {xplane}", file=sys.stderr)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [
        pl for pl in xs.planes
        if pl.name.startswith("/device:") and pl.lines
    ]
    if not planes:
        print(json.dumps({"error": "no device plane", "xplane": xplane}))
        return
    plane = next((pl for pl in planes if "TPU" in pl.name), planes[0])
    md = plane.event_metadata
    ops = next(l for l in plane.lines if l.name == "XLA Ops")
    steps_line = next((l for l in plane.lines if l.name == "Steps"), None)
    nsteps = (
        sum(1 for e in steps_line.events
            if e.duration_ps > min_step_ms * 1e9)
        if steps_line is not None else 1
    ) or 1

    smd = plane.stat_metadata
    cat_ids = {i for i, s in smd.items() if s.name == "hlo_category"}

    def md_stats(m):
        out = {}
        for st in m.stats:
            out[smd[st.metadata_id].name] = (
                st.str_value or st.int64_value or st.uint64_value
            )
        return out

    by_op = collections.Counter()
    by_family = collections.Counter()
    n_family = collections.Counter()
    by_cat = collections.Counter()
    # provenance attribution straight from the op metadata: tf_op carries
    # the jit scope / flax module path, flops+bytes_accessed give achieved
    # rates. This is the robust channel — fusion DISPLAY names can drift
    # from the compiled HLO text under the remote (axon) compiler, which is
    # why the fusion_roots HLO-text matching below sometimes reports
    # "names not found" (r05 lesson; the tf_op table found the strided
    # downsample conv at 16% MXU efficiency that the name matching missed).
    by_tfop = collections.defaultdict(lambda: [0, 0, 0, 0])  # dur, flops, bytes, n
    for e in ops.events:
        m = md[e.metadata_id]
        name = m.display_name or m.name
        by_op[name] += e.duration_ps
        fam = re.sub(r"[.\d]+$", "", name)
        by_family[fam] += e.duration_ps
        n_family[fam] += 1
        cat = ""
        for st in e.stats:
            if st.metadata_id in cat_ids:
                cat = st.str_value
                break
        by_cat[cat or "?"] += e.duration_ps
        ms = md_stats(m)
        row = by_tfop[ms.get("tf_op") or name]
        row[0] += e.duration_ps
        row[1] = ms.get("flops", 0) or 0  # per-execution
        row[2] = ms.get("bytes_accessed", 0) or 0
        row[3] += 1
    total = sum(by_op.values())

    print(f"{'ms/step':>8}  {'%':>5}  hlo_category")
    for cat, ps in by_cat.most_common(12):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  {cat}")
    print()

    print(f"{'ms/step':>8}  {'%':>5}  {'n':>6}  op family "
          f"({nsteps} real steps traced)")
    for fam, ps in by_family.most_common(20):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  "
              f"{n_family[fam]:6}  {fam[:90]}")
    print(f"\n{'ms/step':>8}  {'%':>5}  top individual ops")
    for name, ps in by_op.most_common(15):
        print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  {name[:90]}")

    rows = []
    for tfop, (dur, fl, by, n) in by_tfop.items():
        if dur <= 0 or n == 0:
            continue
        ms = dur / 1e9 / nsteps
        if ms < 0.05:
            continue
        per_exec_s = dur / n / 1e12  # flops/bytes are per-execution
        rows.append((
            ms,
            fl / per_exec_s / 1e12 if fl else 0.0,   # achieved TFLOP/s
            by / per_exec_s / 1e9 if by else 0.0,    # achieved GB/s
            re.sub(r"^jit\([\w.]+\)/", "", tfop),
        ))
    rows.sort(reverse=True)
    print(f"\n{'ms/step':>8} {'TFLOP/s':>8} {'GB/s':>7}  provenance (tf_op; "
          "XLA-reported flops — strided convs are counted ~5x, see QUIRKS #29)")
    for ms, tfs, gbs, name in rows[:30]:
        print(f"{ms:8.2f} {tfs:8.0f} {gbs:7.0f}  {name[:95]}")

    if fusion_roots:
        by_root = collections.Counter()
        n_root = collections.Counter()
        unmatched = collections.Counter()
        for name, ps in by_op.items():
            if "fusion" not in name:
                continue
            root = fusion_roots.get(name)
            if root is None:
                unmatched[name] += ps
                continue
            by_root[root] += ps
            n_root[root] += 1
        print(f"\n{'ms/step':>8}  {'%':>5}  {'n':>4}  fusion bucket by "
              f"(root op [+conv/+dot if the body holds MXU work], shape)")
        for root, ps in by_root.most_common(25):
            print(f"{ps / 1e9 / nsteps:8.2f}  {100 * ps / total:5.1f}  "
                  f"{n_root[root]:4}  {root[:100]}")
        if unmatched:
            ups = sum(unmatched.values())
            print(f"{ups / 1e9 / nsteps:8.2f}  "
                  f"{100 * ups / total:5.1f}"
                  f"     (trace fusion names not found in compiled HLO; top:")
            for name, ps in unmatched.most_common(8):
                print(f"{'':>17}{ps / 1e9 / nsteps:8.2f}  {name[:80]}")
            print(f"{'':>17})")
    print(f"total device time: {total / 1e9 / nsteps:.1f} ms/step")
