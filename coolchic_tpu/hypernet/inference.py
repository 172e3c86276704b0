"""Hypernet checkpoint I/O and per-image evaluation / delta-subset search.

Reference: coolchic/hypernet/inference.py — checkpoint loading (:30-61),
per-image eval with the best subset of (arm, synthesis, upsampling) deltas
picked by RD cost (:98-177), and dataset sweeps written to CSV (:230-268).
"""

from __future__ import annotations

import itertools
import pickle
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.hypernet.wholenet import DeltaWholeNet, NOWholeNet, WholeNetState
from coolchic_tpu.models.config import CoolChicConfig
from coolchic_tpu.train.loss import loss_function


def save_checkpoint(state: WholeNetState, path: Path, samples_seen: int = 0) -> None:
    """samples_{N}.pkl convention (reference: hypernet/training.py:371-373)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "hypernet": jax.tree.map(np.asarray, state.hypernet),
                "decoder": jax.tree.map(np.asarray, state.decoder),
                "samples_seen": samples_seen,
            },
            f,
        )


def load_checkpoint(path: Path) -> WholeNetState:
    """Load a checkpoint; ``path`` may be a directory with the ``__latest``
    convention — the highest samples_N.pkl wins
    (reference: delta_hypernet_train.py:58-72, utils/paths.py:38-41)."""
    return load_checkpoint_meta(path)[0]


def load_checkpoint_meta(path: Path) -> tuple[WholeNetState, int]:
    """(state, samples_seen) of a checkpoint — the sample counter lets a
    crash-resumed ``train_wholenet`` continue on the global schedule clock
    (``samples_offset``). Directory paths follow the ``__latest`` rule."""
    path = Path(path)
    if path.is_dir():
        candidates = sorted(
            path.glob("samples_*.pkl"),
            key=lambda p: int(p.stem.split("_")[1]),
        )
        assert candidates, f"No samples_*.pkl checkpoint in {path}"
        path = candidates[-1]
    with open(path, "rb") as f:
        raw = pickle.load(f)
    state = WholeNetState(hypernet=raw["hypernet"], decoder=raw["decoder"])
    return state, int(raw.get("samples_seen", 0))


def eval_image_delta_subsets(
    net: DeltaWholeNet,
    state: WholeNetState,
    img: jax.Array,  # [3, H, W]
    lmbda: float,
) -> Dict:
    """Try all 8 on/off combinations of the (arm, synthesis, upsampling)
    deltas and keep the best RD cost (reference: inference.py:98-177)."""
    latents, deltas = net.predict(state, img[None])
    cfg: CoolChicConfig = net.cfg

    best = None
    from coolchic_tpu.models.coolchic import coolchic_forward_latents

    for use_arm, use_syn, use_ups in itertools.product([False, True], repeat=3):
        scale = {
            "arm": 1.0 if use_arm else 0.0,
            "synthesis": 1.0 if use_syn else 0.0,
            "upsampling": 1.0 if use_ups else 0.0,
        }
        nets = {
            m: jax.tree.map(
                lambda base, d: base + scale[m] * d[0], state.decoder[m], deltas[m]
            )
            for m in ("arm", "synthesis", "upsampling")
        }
        decoded, rate, _ = coolchic_forward_latents(
            nets, [l[0] for l in latents], cfg, training=False
        )
        out = loss_function(decoded, rate, img, lmbda)
        row = {
            "loss": float(out.loss),
            "psnr_db": float(out.psnr_db),
            "rate_latent_bpp": float(out.rate_latent_bpp),
            "option_selected": f"arm={int(use_arm)},syn={int(use_syn)},ups={int(use_ups)}",
        }
        if best is None or row["loss"] < best["loss"]:
            best = row
    return best


def eval_image_delta_subsets_rated(
    net: DeltaWholeNet,
    state: WholeNetState,
    img: jax.Array,  # [3, H, W]
    lmbda: float,
) -> Dict:
    """Delta-subset switch search with the delta TRANSMISSION rate
    accounted: each enabled module's RD-quantized delta pays its measured
    exp-Golomb rate (rate_nn), so the selection genuinely trades delta
    bits against distortion. The free-delta variant above always selects
    the full subset because deltas cost nothing there (round-4 verdict).

    The deltas are quantized once with every module enabled (greedy
    per-module, reference: quantizemodel.py:443-616) and subsets reuse
    that quantization — the same simplification the reference's switch
    search makes (its per-option evals share the trained quantization,
    inference.py:98-177)."""
    from coolchic_tpu.models.coolchic import coolchic_forward_latents

    lat0, qdeltas, infos = quantize_image_deltas(net, state, img, lmbda)
    cfg: CoolChicConfig = net.cfg
    n_pix = img.shape[1] * img.shape[2]
    names = ("arm", "synthesis", "upsampling")

    best = None
    for use in itertools.product([False, True], repeat=3):
        on = dict(zip(names, use))
        nets = {
            m: (jax.tree.map(lambda b, d: b + d, state.decoder[m], qdeltas[m])
                if on[m] else state.decoder[m])
            for m in names
        }
        decoded, rate, _ = coolchic_forward_latents(nets, lat0, cfg,
                                                    training=False)
        out = loss_function(decoded, rate, img, lmbda)
        rate_nn_bpp = sum(
            float(infos[m].rate_bits) for m in names if on[m]
        ) / n_pix
        row = {
            "loss": float(out.loss) + lmbda * rate_nn_bpp,
            "psnr_db": float(out.psnr_db),
            "rate_latent_bpp": float(out.rate_latent_bpp),
            "rate_nn_bpp": rate_nn_bpp,
            "option_selected": (
                f"arm={int(on['arm'])},syn={int(on['synthesis'])},"
                f"ups={int(on['upsampling'])}"
            ),
        }
        if best is None or row["loss"] < best["loss"]:
            best = row
    return best


def quantize_image_deltas(
    net: DeltaWholeNet,
    state: WholeNetState,
    img: jax.Array,  # [3, H, W]
    lmbda: float,
):
    """Predict latents + deltas for one image and RD-quantize the deltas —
    the transmissible form of a hypernet output
    (reference: quantizemodel.py:443-616 via inference.py:87).

    Returns (latents list of [1, h, w], quantized delta pytrees,
    per-module ModuleQuantInfo for the delta symbols)."""
    from coolchic_tpu.train.quantize_model import quantize_model_deltas

    latents, deltas = net.predict(state, img[None])
    lat0 = [l[0] for l in latents]
    delta0 = jax.tree.map(lambda d: d[0], deltas)
    qdeltas, infos = quantize_model_deltas(
        state.decoder, delta0, lat0, img, lmbda, net.cfg
    )
    return lat0, qdeltas, infos


def hypernet_to_bitstream(
    net: DeltaWholeNet,
    state: WholeNetState,
    img: jax.Array,  # [3, H, W]
    lmbda: float,
    bitdepth: int = 8,
) -> tuple:
    """One-forward-pass encode: hypernet prediction -> quantized deltas ->
    materialized decoder -> standard decodable bitstream.

    The CABAC bitstream format transmits absolute weights (reference:
    enc/bitstream/encode.py), so after the delta RD-quantization the
    decoder (base + quantized delta) is re-quantized through the standard
    module grid for the stream; the delta infos report the delta-domain
    rate (what a base-sharing receiver would pay).

    Returns (bitstream bytes, info dict)."""
    from coolchic_tpu.bitstream import encode_image_bitstream
    from coolchic_tpu.train.quantize_model import quantize_model_with_info

    lat0, qdeltas, delta_infos = quantize_image_deltas(net, state, img, lmbda)
    params = {
        m: jax.tree.map(lambda b, d: b + d, state.decoder[m], qdeltas[m])
        for m in state.decoder
    }
    # Predicted latents are already in the stored (pre-gain) convention —
    # coolchic_forward applies cfg.encoder_gain itself (same fix as
    # wholenet.image_to_coolchic; dividing again shrank every transmitted
    # latent symbol 16x).
    params["latents"] = [jax.lax.stop_gradient(l[0][None]) for l in lat0]
    qparams, infos = quantize_model_with_info(params, img, lmbda, net.cfg)
    nn_q_step = {
        m: {"weight": float(i.q_step_w), "bias": float(i.q_step_b)}
        for m, i in infos.items()
    }
    nn_expgol = {
        m: {"weight": int(i.expgol_w), "bias": int(i.expgol_b)}
        for m, i in infos.items()
    }
    bs = encode_image_bitstream(
        qparams, net.cfg, nn_q_step, nn_expgol, bitdepth=bitdepth
    )
    return bs, {"delta_infos": delta_infos, "nn_infos": infos}


def eval_dataset(
    net,
    state: WholeNetState,
    images: Iterable,  # iterable of (name, [3, H, W] array)
    lmbda: float,
    csv_path: Optional[Path] = None,
    delta_subset_search: bool = False,
) -> List[Dict]:
    """Per-image sweep -> rows (and optional CSV with the reference's
    ablation schema, reference: inference.py:230-268)."""
    rows = []
    for name, img in images:
        img = jnp.asarray(img)
        if delta_subset_search and isinstance(net, DeltaWholeNet):
            row = eval_image_delta_subsets(net, state, img, lmbda)
        else:
            decoded, rate = net.forward(state, img[None], training=False)
            out = loss_function(decoded[0], rate[0], img, lmbda)
            row = {
                "loss": float(out.loss),
                "psnr_db": float(out.psnr_db),
                "rate_latent_bpp": float(out.rate_latent_bpp),
                "option_selected": "none",
            }
        mse = 10 ** (-row["psnr_db"] / 10)
        rows.append(
            {
                "seq_name": name,
                "rate_bpp": row["rate_latent_bpp"],
                "rate_latent_bpp": row["rate_latent_bpp"],
                "rate_nn_bpp": 0.0,
                "psnr_db": row["psnr_db"],
                "mse": mse,
                "option_selected": row["option_selected"],
            }
        )
    if csv_path is not None:
        import csv

        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    return rows
