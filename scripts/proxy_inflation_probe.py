"""Empirically calibrate the RD-sweep proxy bias on the one TRUE original
fragment available offline.

The RD sweeps measure both curves against the published lambda=1e-4
reconstruction (the "proxy") because the Kodak originals cannot be
downloaded. scripts/proxy_bias.py bounds the resulting flattery in the
WORST case (~8.6% BD-rate) from the reference's own true-vs-proxy PSNR
table, but that bound assumes our encoder exploits the proxy's artifacts
maximally. This script MEASURES the exploitation on ground truth:

  /root/reference/test/data/192x128_kodim15.png is a 4x Lanczos downscale
  of the TRUE kodim15 original (verified: 49.4 dB against the same
  downscale of the lambda=1e-4 reconstruction, vs ~11 dB best alignment
  for any spatial crop) — the only true-pixel Kodak data on this machine.

Protocol (same budget/arch/warmup as the medium sweep):
  * T = the true 192x128 image; P = the same 4x Lanczos downscale applied
    to the full-res lambda=1e-4 reconstruction (the proxy at this scale).
  * For fit-target in {P, T}, lambda in the 4 sweep points, loop in {0,1}:
    full c3x encode (warmup -> 30k-iter phase schedule x2 loops -> NN
    quantization -> real bitstream -> integer decode). Keep the better
    RD loop per (fit, lambda), with RD measured against the fit target
    exactly as the sweep's finalize does.
  * inflation(recon) = PSNR(recon, P) - PSNR(recon, T).
    The sweep's methodology flatters us by
        delta(lambda) = inflation[fit=P](lambda) - inflation[fit=T](lambda)
    because our sweep points fit the proxy while the reference's published
    points fit the truth (their inflation is the fit=T row's analogue).
  * Convert delta into BD-rate: BD(proxy-space curves) vs BD after
    deducting delta(lambda) from the proxy-fitted curve's PSNRs.

Caveats this cannot remove: one image, and a 4x-downscaled scale at which
the proxy is cleaner (49.4 dB to truth) than at full resolution (~40.5 dB)
— so the measured delta is a same-methodology *calibration point*, not a
bound. Run on a real chip:

    python scripts/proxy_inflation_probe.py run        # checkpointed
    python scripts/proxy_inflation_probe.py finalize   # bitstreams + json
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROOT = Path(__file__).resolve().parents[1]
WORKDIR = ROOT / "results/image/kodak/tpu_sweep/inflation_probe"
TRUE_PNG = Path("/root/reference/test/data/192x128_kodim15.png")
PROXY_NPY = ROOT / "results/image/kodak/tpu_sweep/targets/kodim15.npy"
SWEEP_LAMBDAS = (4e-4, 1e-3, 4e-3, 2e-2)
N_LOOPS = 2          # medium budget
PHASE1_ITERS = 30_000
ARCH = {"dim_arm": 16}  # the sweep's dominant-published-arch default
SIZE = (128, 192)
DEV_CHUNK = 8        # 192x128 jobs are ~16x lighter than the sweep's


def _targets():
    from PIL import Image

    t = np.asarray(Image.open(TRUE_PNG)).astype(np.float32) / 255.0
    t = np.ascontiguousarray(t.transpose(2, 0, 1))
    proxy_full = np.load(PROXY_NPY)  # [3, 512, 768] float32
    chans = []
    for c in range(3):
        im = Image.fromarray(proxy_full[c], mode="F")
        chans.append(np.asarray(im.resize((SIZE[1], SIZE[0]), Image.LANCZOS)))
    p = np.clip(np.stack(chans), 0.0, 1.0).astype(np.float32)
    return {"true": t, "proxy": p}


def job_list():
    jobs = []
    for fit in ("proxy", "true"):
        for lm in SWEEP_LAMBDAS:
            for loop in range(N_LOOPS):
                jobs.append({"fit": fit, "lmbda": lm, "loop": loop,
                             "uid": len(jobs)})
    return jobs


def _save(p: Path, obj) -> None:
    tmp = p.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    tmp.replace(p)


def _load(p: Path):
    with open(p, "rb") as f:
        return pickle.load(f)


def cmd_run(args) -> None:
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models import CoolChicConfig, init_coolchic_params
    from coolchic_tpu.train.presets import preset_c3x
    from coolchic_tpu.train.quantize_model import quantize_model_with_info
    from coolchic_tpu.train.step import (
        _phase_geometry,
        finish_phase,
        init_phase_state,
        run_phase_blocks,
        run_phase_rem_block,
    )

    sys.path.insert(0, str(ROOT / "scripts"))
    from kodak_rd_sweep import _chip_seg_iters

    WORKDIR.mkdir(parents=True, exist_ok=True)
    spath = WORKDIR / "state.pkl"
    fpath = WORKDIR / "final.pkl"
    if fpath.exists():
        print("already final")
        return

    preset = preset_c3x()
    phases = list(preset.all_phases)
    phases[0] = type(phases[0])(**{**phases[0].__dict__,
                                   "max_itr": PHASE1_ITERS})
    wp = preset.warmup.phases

    tgt = _targets()
    jobs = job_list()
    cfg = CoolChicConfig(img_size=SIZE, **ARCH)
    targets = np.stack([tgt[j["fit"]] for j in jobs])
    lmbdas = np.asarray([j["lmbda"] for j in jobs], np.float32)
    jkeys = np.asarray(jax.vmap(
        lambda u: jax.random.fold_in(jax.random.PRNGKey(args.seed), u)
    )(jnp.asarray([j["uid"] for j in jobs])))

    # The tunnel kill window limits device-program DURATION; these jobs are
    # 16x smaller than the sweep's 512x768 ones, so scale the probed
    # per-call iteration budget up (conservatively 8x, capped).
    _, seg_iters = _chip_seg_iters()
    seg_iters = min(8 * seg_iters, 8000)

    def to_np(t):
        return jax.tree.map(np.asarray, t)

    def chunked(fn, *trees):
        outs = []
        for c0 in range(0, len(jobs), DEV_CHUNK):
            sl = slice(c0, min(c0 + DEV_CHUNK, len(jobs)))
            a = [jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[sl]), t)
                 for t in trees]
            outs.append(to_np(fn(*a)))
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)

    st = _load(spath) if spath.exists() else {"stage": "warmup_init"}
    t0 = time.time()

    while st["stage"] != "done":
        stage = st["stage"]
        if stage == "warmup_init":
            n0 = wp[0].candidates
            init_keys = jax.vmap(
                lambda k: jax.random.split(jax.random.fold_in(k, 0), n0)
            )(jnp.asarray(jkeys))
            cand = jax.vmap(jax.vmap(
                lambda k: init_coolchic_params(k, cfg)
            ))(init_keys)
            st = {"stage": "warmup_phase", "wp_idx": 0, "cand": to_np(cand)}
            _save(spath, st)
        elif stage == "warmup_phase":
            i = st["wp_idx"]
            phase_w = type(wp[i].training_phase)(
                **{**wp[i].training_phase.__dict__, "freq_valid": 100}
            )
            n = wp[i].candidates
            cand = st["cand"]
            if i > 0:
                order = np.argsort(st["losses"], axis=1)[:, :n]
                cand = jax.tree.map(
                    lambda a: np.take_along_axis(
                        a, order.reshape(order.shape + (1,) * (a.ndim - 2)),
                        axis=1),
                    cand)
            train_keys = np.asarray(jax.vmap(
                lambda k: jax.random.split(jax.random.fold_in(k, i + 1), n)
            )(jnp.asarray(jkeys)))
            flat = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), cand)
            fkeys = train_keys.reshape(-1, 2)
            ftargets = np.repeat(targets, n, axis=0)
            flmbdas = np.repeat(lmbdas, n)
            freq, nfb, rem, _ = _phase_geometry(phase_w)
            n_flat = len(jobs) * n
            done = list(st.get("wp_done", []))
            for c0 in range(len(done) * DEV_CHUNK, n_flat, DEV_CHUNK):
                sl = slice(c0, min(c0 + DEV_CHUNK, n_flat))
                cflat = jax.tree.map(lambda a: jnp.asarray(a[sl]), flat)
                ck, ct = jnp.asarray(fkeys[sl]), jnp.asarray(ftargets[sl])
                cl = jnp.asarray(flmbdas[sl])
                ps = jax.vmap(
                    lambda p, t, l, k: init_phase_state(p, t, l, k, cfg,
                                                        phase_w)
                )(cflat, ct, cl, ck)
                blocks_per_call = max(1, seg_iters // freq)
                b0 = 0
                while b0 < nfb:
                    nb = min(blocks_per_call, nfb - b0)
                    ps = jax.vmap(
                        lambda s, t, l: run_phase_blocks(
                            s, t, l, jnp.int32(b0), cfg, phase_w, nb)
                    )(ps, ct, cl)
                    b0 += nb
                if rem:
                    ps = jax.vmap(
                        lambda s, t, l: run_phase_rem_block(
                            s, t, l, jnp.int32(nfb), cfg, phase_w, rem)
                    )(ps, ct, cl)
                cbest, clogs = jax.vmap(finish_phase)(ps)
                done.append((to_np(cbest), np.asarray(clogs.loss)))
                st = {**st, "wp_done": done}
                _save(spath, st)
            best = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                                *[d[0] for d in done])
            cand = jax.tree.map(
                lambda a: a.reshape(len(jobs), n, *a.shape[1:]), best)
            losses = np.concatenate([d[1] for d in done]).reshape(
                len(jobs), n)
            if i + 1 < len(wp):
                st = {"stage": "warmup_phase", "wp_idx": i + 1,
                      "cand": to_np(cand), "losses": losses}
            else:
                winner = np.argmin(losses, axis=1)
                params = jax.vmap(
                    lambda c, o: jax.tree.map(lambda a: a[o], c)
                )(cand, jnp.asarray(winner))
                st = {"stage": "phase_init", "phase_idx": 0,
                      "params": to_np(params)}
            _save(spath, st)
        elif stage == "phase_init":
            pi = st["phase_idx"]
            phase = phases[pi]
            pkeys = np.asarray(jax.vmap(
                lambda k: jax.random.fold_in(k, 1000 + pi)
            )(jnp.asarray(jkeys)))
            ps = chunked(
                jax.vmap(lambda p, t, l, k: init_phase_state(
                    p, t, l, k, cfg, phase)),
                st["params"], targets, lmbdas, pkeys)
            st = {"stage": "phase_blocks", "phase_idx": pi, "block": 0,
                  "ps": ps, "infos": st.get("infos")}
            _save(spath, st)
        elif stage == "phase_blocks":
            pi = st["phase_idx"]
            phase = phases[pi]
            freq, nfb, rem, _ = _phase_geometry(phase)
            seg_blocks = max(1, seg_iters // freq)
            b0, ps = st["block"], st["ps"]
            if b0 < nfb:
                nb = min(seg_blocks, nfb - b0)
                ps = chunked(
                    jax.vmap(lambda s, t, l: run_phase_blocks(
                        s, t, l, jnp.int32(b0), cfg, phase, nb)),
                    ps, targets, lmbdas)
                st = {**st, "block": b0 + nb, "ps": ps}
                _save(spath, st)
            else:
                if rem:
                    ps = chunked(
                        jax.vmap(lambda s, t, l: run_phase_rem_block(
                            s, t, l, jnp.int32(nfb), cfg, phase, rem)),
                        ps, targets, lmbdas)
                best, logs = chunked(jax.vmap(finish_phase), ps)
                nxt = {"params": best, "logs": logs,
                       "infos": st.get("infos")}
                if phase.quantize_model:
                    nxt.update(stage="quantize", phase_idx=pi)
                elif pi + 1 < len(phases):
                    nxt.update(stage="phase_init", phase_idx=pi + 1)
                else:
                    nxt.update(stage="finish")
                st = nxt
                _save(spath, st)
        elif stage == "quantize":
            pi = st["phase_idx"]
            params, infos = chunked(
                jax.vmap(lambda p, t, l: quantize_model_with_info(
                    p, t, l, cfg)),
                st["params"], targets, lmbdas)
            st = {"stage": "phase_init" if pi + 1 < len(phases) else "finish",
                  "phase_idx": pi + 1, "params": params, "infos": infos}
            _save(spath, st)
        elif stage == "finish":
            _save(fpath, {"jobs": jobs, "params": st["params"],
                          "infos": st["infos"], "arch": ARCH,
                          "budget": "medium", "seed": args.seed})
            spath.unlink(missing_ok=True)
            st = {"stage": "done"}
        else:
            raise RuntimeError(f"unknown stage {stage}")
    print(f"probe encode done in {time.time() - t0:.0f} s")


def cmd_finalize(_args) -> None:
    import jax

    from coolchic_tpu.bitstream import decode_bitstream, encode_image_bitstream
    from coolchic_tpu.eval.bd_rate import bd_rate
    from coolchic_tpu.models import CoolChicConfig

    final = _load(WORKDIR / "final.pkl")
    tgt = _targets()
    cfg = CoolChicConfig(img_size=SIZE, **final["arch"])

    def psnr(a, b):
        return float(-10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    best = {}
    for j, job in enumerate(final["jobs"]):
        params_j = jax.tree.map(lambda a: a[j], final["params"])
        infos_j = {m: jax.tree.map(lambda a: a[j], i)
                   for m, i in final["infos"].items()}
        nn_q_step = {m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
                     for m, i in infos_j.items()}
        nn_expgol = {m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
                     for m, i in infos_j.items()}
        bs = encode_image_bitstream(params_j, cfg, nn_q_step, nn_expgol)
        img, _ = decode_bitstream(bs, integer_pipeline=True)
        fit_img = tgt[job["fit"]]
        bpp = len(bs) * 8 / (SIZE[0] * SIZE[1])
        rd = float(np.mean((img - fit_img) ** 2)) + job["lmbda"] * bpp
        key = (job["fit"], job["lmbda"])
        row = {"fit": job["fit"], "lmbda": job["lmbda"], "rate_bpp": bpp,
               "psnr_vs_proxy": psnr(img, tgt["proxy"]),
               "psnr_vs_true": psnr(img, tgt["true"]),
               "rd_cost_vs_fit": rd, "loop": job["loop"],
               "n_bytes": len(bs)}
        if key not in best or rd < best[key]["rd_cost_vs_fit"]:
            best[key] = row

    rows = [best[k] for k in sorted(best)]
    for r in rows:
        r["inflation_db"] = r["psnr_vs_proxy"] - r["psnr_vs_true"]
    delta = {}
    for lm in SWEEP_LAMBDAS:
        if ("proxy", lm) in best and ("true", lm) in best:
            delta[str(lm)] = (best[("proxy", lm)]["inflation_db"]
                              - best[("true", lm)]["inflation_db"])

    # BD-rate of the methodology's flattery at this scale: proxy-fitted
    # curve scored in proxy space (what the sweep reports) vs the same
    # bitstreams scored in TRUE space, against the true-fitted curve's
    # true-space scores (what an original-data sweep would report).
    pr = [best[("proxy", lm)] for lm in SWEEP_LAMBDAS
          if ("proxy", lm) in best]
    tr = [best[("true", lm)] for lm in SWEEP_LAMBDAS if ("true", lm) in best]
    summary = {}
    if len(pr) == 4 and len(tr) == 4:
        bd_proxy_space = bd_rate(
            [r["rate_bpp"] for r in tr], [r["psnr_vs_proxy"] for r in tr],
            [r["rate_bpp"] for r in pr], [r["psnr_vs_proxy"] for r in pr])
        bd_true_space = bd_rate(
            [r["rate_bpp"] for r in tr], [r["psnr_vs_true"] for r in tr],
            [r["rate_bpp"] for r in pr], [r["psnr_vs_true"] for r in pr])
        summary = {
            "bd_rate_proxy_space_pct": round(bd_proxy_space, 3),
            "bd_rate_true_space_pct": round(bd_true_space, 3),
            "methodology_flattery_pct": round(
                bd_true_space - bd_proxy_space, 3),
        }

    out = {
        "what": ("Proxy-bias calibration on the one TRUE Kodak fragment "
                 "available offline (192x128 4x-Lanczos downscale of "
                 "kodim15; reference test asset). Same budget/arch/warmup "
                 "as the medium sweep. fit=proxy mirrors our sweep points; "
                 "fit=true mirrors the reference's published points."),
        "proxy_vs_true_psnr_db": psnr(tgt["proxy"], tgt["true"]),
        "rows": rows,
        "inflation_delta_db_per_lambda": delta,
        **summary,
        "caveats": ("Single image and a 4x-downscaled scale at which the "
                    "proxy is cleaner than at full resolution — a "
                    "calibration point for the worst-case bound in "
                    "proxy_bias.json, not a replacement for it."),
    }
    (WORKDIR / "inflation_probe.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in [("run", cmd_run), ("finalize", cmd_finalize)]:
        p = sub.add_parser(name)
        p.add_argument("--seed", type=int, default=7)
        p.set_defaults(fn=fn)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
