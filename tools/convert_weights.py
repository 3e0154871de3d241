#!/usr/bin/env python
"""Convert every pretrained checkpoint found under --root to flax msgpack,
record golden probe values, and report what's missing (WEIGHTS.md).

Usage:
  python tools/convert_weights.py --root pretrained_models [--out DIR]
  python tools/convert_weights.py --root pretrained_models --validate

Each converted net is probed with a deterministic input; the probe output is
stored in <out>/goldens.json together with the source file's sha256. With
--validate, the stored msgpack params are re-probed and compared against the
goldens — catching corrupted, truncated, or swapped weight files.

Reference weight sources: /root/reference README.md:60-66 + per-loss config
model_path entries; see WEIGHTS.md for the full table.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _probe_image(size: int, channels: int = 3, lo: float = -1.0, hi: float = 1.0):
    rng = np.random.default_rng(1234)
    x = rng.random((1, size, size, channels), dtype=np.float32)
    return x * (hi - lo) + lo


def _predictor_entry(loss_name: str, mod_name: str, patterns, probe_size=128):
    """Spec for a losses/predictors module (make_model/features API)."""

    def convert(path):
        import importlib

        mod = importlib.import_module(f"gan_control_tpu.losses.predictors.{mod_name}")
        model = mod.make_model({"center_crop": None})
        return mod.convert_torch_weights(model, path)

    def probe(params):
        import importlib

        mod = importlib.import_module(f"gan_control_tpu.losses.predictors.{mod_name}")
        model = mod.make_model({"center_crop": None})
        out = mod.features(model, params, _probe_image(probe_size))[-1]
        return np.asarray(out)

    return {"name": loss_name, "patterns": patterns, "convert": convert,
            "probe": probe}


def _fan_entry():
    def convert(path):
        from gan_control_tpu.alignment import fan

        return fan.convert_torch_weights(path)

    def probe(params):
        from gan_control_tpu.alignment import fan

        net = fan.FANNet()
        return np.asarray(net.apply(params, _probe_image(256, lo=0.0))[-1])

    # 3DFAN4 first: a face_alignment cache usually holds 2DFAN4 too, and a
    # bare *DFAN4* glob would sort 2DFAN4 ahead of the 3D checkpoint the
    # alignment pipeline (and the sha pin) expects
    return {"name": "fan",
            "patterns": ["*3DFAN4*.pth*", "*3DFAN-4*.pth*",
                         "*DFAN4*.pth*", "*DFAN-4*.pth*"],
            "convert": convert, "probe": probe}


def _sfd_entry():
    def convert(path):
        from gan_control_tpu.alignment import sfd

        return sfd.convert_torch_weights(path)

    def probe(params):
        from gan_control_tpu.alignment import sfd

        net = sfd.S3FD()
        heads = net.apply(params, _probe_image(128, lo=-120.0, hi=130.0))
        return np.asarray(heads[0][0])

    return {"name": "sfd", "patterns": ["s3fd*.pth"], "convert": convert,
            "probe": probe}


def _blazeface_entry():
    def convert(path):
        from gan_control_tpu.alignment import blazeface

        return blazeface.convert_torch_weights(path)

    def probe(params):
        from gan_control_tpu.alignment import blazeface

        net = blazeface.BlazeFaceNet()
        raw_box, _ = net.apply(params, _probe_image(128))
        return np.asarray(raw_box)

    return {"name": "blazeface", "patterns": ["blazeface*.pth"],
            "convert": convert, "probe": probe}


def _inception_entry():
    def convert(path):
        from gan_control_tpu.evaluation import inception

        return inception.convert_torch_weights(path)

    def probe(params):
        from gan_control_tpu.evaluation import inception

        return np.asarray(
            inception.InceptionV3Features().apply(params, _probe_image(299, lo=0.0))
        )

    return {"name": "fid_inception", "patterns": ["pt_inception*.pth"],
            "convert": convert, "probe": probe}


def _lpips_entry():
    def convert(path):
        # path = lin weights; the vgg16 backbone must live next to them or
        # one directory up (e.g. root/lpips/vgg.pth + root/vgg16-*.pth)
        from gan_control_tpu.projection import lpips

        base = os.path.dirname(path)
        vgg = _find(base, ["vgg16*.pth"]) or _find(
            os.path.dirname(base) or ".", ["vgg16*.pth"]
        )
        if vgg is None:
            raise FileNotFoundError(
                f"lpips lin weights found at {path} but no vgg16*.pth backbone "
                f"near it — converting without it would silently produce a "
                f"randomly-initialized LPIPS (see WEIGHTS.md)"
            )
        return lpips.convert_torch_weights(vgg, path)

    def probe(params):
        from gan_control_tpu.projection import lpips

        return np.asarray(
            lpips.lpips_distance(params, _probe_image(64), -_probe_image(64))
        )

    return {"name": "lpips", "patterns": ["lpips_vgg*.pth", "lpips/vgg.pth"],
            "convert": convert, "probe": probe}


def make_specs():
    return [
        _predictor_entry("embedding_loss", "arcface", ["model_ir_se50.pth"], 112),
        _predictor_entry("orientation_loss", "hopenet",
                         ["hopenet_robust_alpha1.pkl"]),
        _predictor_entry("expression_loss", "esr9", ["esr_9"]),
        _predictor_entry("age_loss", "dex_age", ["dex_imdb_wiki.pt"]),
        _predictor_entry(
            "hair_loss", "hair_pspnet", ["pspnet_resnet101*.pth"]),
        _predictor_entry(
            "recon_3d_loss", "face3dmm",
            ["face3dmm_recon/models/pytorch_converted_model.pt",
             "face3dmm_recon/pytorch_converted_model.pt"]),
        _predictor_entry(
            "dog_id_loss", "dogfacenet",
            ["dogfacenet/models/pytorch_converted_model.pt",
             "dogfacenet/pytorch_converted_model.pt"]),
        _predictor_entry("style_loss", "vgg_style", ["vgg16*.pth"]),
        _predictor_entry("classification_loss", "imagenet_cls",
                         ["resnet18*.pth"]),
        _inception_entry(),
        _fan_entry(),
        _sfd_entry(),
        _blazeface_entry(),
        _lpips_entry(),
    ]


# sha256 pins for the source checkpoints. torch-hub-convention files embed
# the leading hex of their sha256 in the FILENAME — that prefix is the pin
# (torch.hub.load_state_dict_from_url enforces exactly this). The other
# checkpoints are distributed without published digests (gdrive folders,
# author-converted files): their pins start empty and are RECORDED by
# --verify-sha on the first machine that has them, so every later
# conversion is checked against the first verified copy (WEIGHTS.md).
KNOWN_SHA256_PREFIXES = {
    "fid_inception": "6726825d",        # pt_inception-2015-12-05-6726825d.pth
    "style_loss": "397923af",           # vgg16-397923af.pth
    "classification_loss": "f37072fd",  # resnet18-f37072fd.pth
    "sfd": "619a316812",                # s3fd-619a316812.pth
    "fan": "7835d9f11d",                # 3DFAN4-7835d9f11d.pth.tar
}


def verify_sha(specs, root: str, out_dir: str) -> int:
    """--verify-sha: hash every present source checkpoint, check it against
    the filename-prefix pins and any previously recorded digest, and write
    the full digests to <out>/sha256s.json (the recorded manifest)."""
    manifest_path = os.path.join(out_dir, "sha256s.json")
    manifest = (
        json.load(open(manifest_path)) if os.path.exists(manifest_path) else {}
    )
    failed, checked, recorded = [], 0, []
    for spec in specs:
        name = spec["name"]
        src = _find(root, spec["patterns"])
        if src is None:
            continue
        digest = _sha256(src)
        checked += 1
        pin = KNOWN_SHA256_PREFIXES.get(name)
        if pin is not None and not digest.startswith(pin):
            failed.append(name)
            print(f"  MISMATCH {name}: sha256 {digest[:16]}… does not start "
                  f"with the published pin {pin} ({src})")
            continue
        prev = manifest.get(name)
        if prev is not None and prev["sha256"] != digest:
            failed.append(name)
            print(f"  MISMATCH {name}: sha256 {digest[:16]}… != previously "
                  f"recorded {prev['sha256'][:16]}… ({src})")
            continue
        if prev is None:
            recorded.append(name)
        manifest[name] = {"source": os.path.basename(src), "sha256": digest}
        print(f"  OK      {name}  {digest[:16]}…"
              + ("  [pinned]" if pin else "  [recorded]"))
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"verified {checked} checkpoints, {len(failed)} mismatches"
          + (f", recorded {len(recorded)} new digests" if recorded else ""))
    return 1 if failed else 0


def _find(root: str, patterns) -> str | None:
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(root, pat)))
        hits += sorted(glob.glob(os.path.join(root, "**", pat), recursive=True))
        if hits:
            return hits[0]
    return None


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    files = (
        sorted(
            f
            for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f)
        )
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 22), b""):
                h.update(chunk)
    return h.hexdigest()


def _golden_summary(out: np.ndarray) -> dict:
    flat = out.reshape(-1).astype(np.float64)
    return {
        "shape": list(out.shape),
        "first8": [float(v) for v in flat[:8]],
        "mean": float(flat.mean()),
        "std": float(flat.std()),
    }


def _goldens_match(a: dict, b: dict, rtol=1e-3, atol=1e-4) -> bool:
    return (
        a["shape"] == b["shape"]
        and np.allclose(a["first8"], b["first8"], rtol=rtol, atol=atol)
        and np.isclose(a["mean"], b["mean"], rtol=rtol, atol=atol)
        and np.isclose(a["std"], b["std"], rtol=rtol, atol=atol)
    )


def main(argv=None):
    import flax.serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="pretrained_models")
    ap.add_argument("--out", default=None,
                    help="default: <root>/converted")
    ap.add_argument("--validate", action="store_true",
                    help="re-probe converted msgpacks against goldens.json")
    ap.add_argument("--verify-sha", action="store_true",
                    help="hash present source checkpoints against the pins "
                    "and the recorded sha256s.json manifest")
    ap.add_argument("--only", nargs="*", default=None,
                    help="limit to these entry names")
    args = ap.parse_args(argv)
    out_dir = args.out or os.path.join(args.root, "converted")
    goldens_path = os.path.join(out_dir, "goldens.json")

    specs = make_specs()
    if args.only:
        specs = [s for s in specs if s["name"] in args.only]

    if args.verify_sha:
        return verify_sha(specs, args.root, out_dir)

    if args.validate:
        goldens = json.load(open(goldens_path))
        failed, checked = [], 0
        for spec in specs:
            name = spec["name"]
            mp = os.path.join(out_dir, f"{name}.msgpack")
            if name not in goldens or not os.path.exists(mp):
                continue
            params = flax.serialization.msgpack_restore(open(mp, "rb").read())
            got = _golden_summary(spec["probe"](params))
            checked += 1
            if _goldens_match(got, goldens[name]["golden"]):
                print(f"  OK      {name}")
            else:
                failed.append(name)
                print(f"  MISMATCH {name}: {got} != {goldens[name]['golden']}")
        print(f"validated {checked} converted nets, {len(failed)} mismatches")
        return 1 if failed else 0

    os.makedirs(out_dir, exist_ok=True)
    goldens = json.load(open(goldens_path)) if os.path.exists(goldens_path) else {}
    converted, missing = [], []
    for spec in specs:
        name = spec["name"]
        src = _find(args.root, spec["patterns"])
        if src is None:
            missing.append((name, spec["patterns"][0]))
            continue
        digest = _sha256(src)
        pin = KNOWN_SHA256_PREFIXES.get(name)
        if pin is not None and not digest.startswith(pin):
            # warn-and-convert: --verify-sha is the strict gate (test
            # fixtures and retrained checkpoints legitimately differ)
            print(f"  WARNING {name}: sha256 {digest[:16]}… does not start "
                  f"with the published pin {pin} ({src}) — not the canonical "
                  f"checkpoint; run --verify-sha to enforce")
        print(f"converting {name} from {src} ...")
        try:
            params = spec["convert"](src)
        except FileNotFoundError as e:
            print(f"  SKIP {name}: {e}")
            missing.append((name, str(e)))
            continue
        blob = flax.serialization.msgpack_serialize(
            flax.serialization.to_state_dict(params)
        )
        mp = os.path.join(out_dir, f"{name}.msgpack")
        with open(mp, "wb") as f:
            f.write(blob)
        golden = _golden_summary(spec["probe"](params))
        goldens[name] = {
            "source": src,
            "source_sha256": digest,
            "golden": golden,
        }
        converted.append(name)
        print(f"  -> {mp} ({len(blob) / 1e6:.1f} MB), "
              f"probe mean={golden['mean']:.6g} std={golden['std']:.6g}")
    with open(goldens_path, "w") as f:
        json.dump(goldens, f, indent=2)

    print(f"\nconverted ({len(converted)}): {', '.join(converted) or '-'}")
    if missing:
        print(f"MISSING ({len(missing)}) — see WEIGHTS.md for sources:")
        for name, pat in missing:
            print(f"  {name}: expected {os.path.join(args.root, pat)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
