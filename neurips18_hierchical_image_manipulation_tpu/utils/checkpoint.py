"""Checkpoint / resume via orbax (SURVEY.md §6.4).

Mirrors the reference's observable layout under
``{checkpoints_dir}/{name}/``: a ``latest`` checkpoint overwritten every
save_latest_freq steps, per-epoch checkpoints (``epoch_N``), and an
``iter.txt`` with "(epoch, iter)" for resume bookkeeping. DIVERGENCE
(documented, deliberate): optimizer state + PRNG key + step are saved too,
so resume is exact — the reference resets Adam moments on resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, opt):
        self.dir = os.path.abspath(os.path.join(opt.checkpoints_dir, opt.name, "ckpt"))
        os.makedirs(self.dir, exist_ok=True)
        self.iter_file = os.path.join(opt.checkpoints_dir, opt.name, "iter.txt")
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, label) -> str:
        return os.path.join(self.dir, str(label))

    def save(self, label, state, epoch: int, epoch_iter: int):
        """label: 'latest' or an epoch number (reference save(epoch))."""
        payload = {
            "params": state.params,
            "opt_state_g": state.opt_state_g,
            "opt_state_d": state.opt_state_d,
            "step": state.step,
            "rng": state.rng,
        }
        path = self._path(label)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        # flat-npz params sidecar: tolerant partial restore for inference
        # (mirrors the reference's per-net {epoch}_net_{G|D}.pth files and
        # its partial-load fallback — SURVEY.md C12 load_network)
        save_params_npz(self._path(f"{label}_params.npz"), state.params)
        with open(self.iter_file, "w") as f:
            f.write(f"{epoch},{epoch_iter}")

    def restore(self, label, state):
        """Restore into an abstract-compatible state (same tree/shape)."""
        template = {
            "params": state.params,
            "opt_state_g": state.opt_state_g,
            "opt_state_d": state.opt_state_d,
            "step": state.step,
            "rng": state.rng,
        }
        restored = self._ckptr.restore(self._path(label), template)
        return state.replace(
            params=restored["params"],
            opt_state_g=restored["opt_state_g"],
            opt_state_d=restored["opt_state_d"],
            step=restored["step"],
            rng=restored["rng"],
        )

    def restore_params(self, label, template):
        """Partial params-only restore from the npz sidecar: every leaf of
        ``template`` present in the checkpoint is loaded; missing keys keep
        the template value (the reference's partial-load fallback)."""
        data = np.load(self._path(f"{label}_params.npz"))
        flat, _ = jax.tree_util.tree_flatten_with_path(template)
        out = []
        missing = []
        for keypath, leaf in flat:
            key = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
            )
            if key in data and data[key].shape == leaf.shape:
                out.append(data[key].astype(np.asarray(leaf).dtype))
            else:
                missing.append(key)
                out.append(leaf)
        if missing:
            print(f"checkpoint partial load: {len(missing)} leaves kept at init")
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), out
        )

    def has_params(self, label) -> bool:
        return os.path.exists(self._path(f"{label}_params.npz"))

    @staticmethod
    def load_pretrain_into(params, pretrain_dir: str, which: str = "latest"):
        """--load_pretrain: initialize from another run's checkpoint with
        key remapping for the coarse-to-fine hand-off — a GlobalGenerator
        checkpoint's trunk (G/params/<x>) loads into the LocalEnhancer's
        global scope (G/params/global/<x>). Missing keys keep init
        (pix2pixHD's partial-load fallback, SURVEY C12)."""
        path = os.path.join(pretrain_dir, "ckpt", f"{which}_params.npz")
        data = np.load(path)
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        out, loaded, missing = [], 0, 0
        for keypath, leaf in flat:
            key = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
            )
            candidates = [key, key.replace("/global/", "/", 1)]
            hit = next(
                (c for c in candidates if c in data and data[c].shape == leaf.shape),
                None,
            )
            if hit is not None:
                out.append(data[hit].astype(np.asarray(leaf).dtype))
                loaded += 1
            else:
                out.append(leaf)
                missing += 1
        print(f"load_pretrain: {loaded} leaves loaded, {missing} kept at init")
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), out
        )

    def read_iter(self):
        """-> (start_epoch, epoch_iter) like the reference's iter.txt."""
        try:
            with open(self.iter_file) as f:
                epoch, it = f.read().strip().split(",")
                return int(epoch), int(it)
        except (FileNotFoundError, ValueError):
            return 1, 0

    def exists(self, label) -> bool:
        return os.path.isdir(self._path(label))


def save_params_npz(path: str, params: Any):
    """Flat-npz export seam (e.g. VGG19 pretrained weights injection)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any):
    """Inverse of save_params_npz against a matching template pytree."""
    data = np.load(path)
    leaves_paths = jax.tree_util.tree_flatten_with_path(template)
    flat, treedef = leaves_paths
    new_leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves
    )
