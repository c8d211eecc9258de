"""Checkpoint / resume / conversion.

Mirrors the reference persistence surface (train.lua:179-185,
util.lua:50-140, model.lua:38-142):

  * per-`epochStore` epoch, the model and the optimizer state are saved
    SEPARATELY (`model_<e>`, `optimState_<e>` — train.lua:179-185), as
    flax-msgpack files plus a JSON options sidecar so a model checkpoint
    is self-describing;
  * `latest_checkpoint` scans a directory for the newest `model_<e>`
    (util.lua:127-140) for `-cont` auto-resume;
  * `-retrain` loads model weights only, `-optimState` restores moments;
  * `convert_to_soft` loads a hard-constraint checkpoint into a
    `past_flow` model via the named-module param remap
    (models/surgery.py; replaces the reference's hard-coded module-index
    surgery, model.lua:56-116).

The reference saved the full serialized network; we save the param
pytree + config, the functional equivalent (and what makes the surgery a
tree remap instead of index arithmetic).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..config import Options


def _to_bytes(tree) -> bytes:
    from flax import serialization
    return serialization.to_bytes(tree)


def _from_bytes(target, data: bytes):
    from flax import serialization
    return serialization.from_bytes(target, data)


def _host(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# Shared async orbax checkpointers (AsyncCheckpointer serializes saves on
# one instance, so model and optim each get their own to overlap): saves
# proceed in background threads; wait_for_saves() drains in-flight writes.
_ORBAX_CKPTRS: dict = {}


def _orbax_checkpointer(key: str):
    if key not in _ORBAX_CKPTRS:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTRS[key] = ocp.StandardCheckpointer()  # AsyncCheckpointer
    return _ORBAX_CKPTRS[key]


def wait_for_saves() -> None:
    """Block until all in-flight async (orbax) checkpoint writes land."""
    for c in _ORBAX_CKPTRS.values():
        c.wait_until_finished()


def save_checkpoint(save_dir: str | Path, state, opt: Options,
                    epoch: int, backend: str = "msgpack") -> Tuple[Path, Path]:
    """Save model_<e> + optimState_<e> (+ options.json sidecar).

    backend='msgpack' (default): single flax-serialization files —
    dependency-free and exactly mirrors the reference's paired
    model/optimState artifacts (train.lua:179-185).
    backend='orbax': orbax-checkpoint directories (ASYNC: save() returns
    once device arrays are snapshotted to host and the write continues in
    a background thread — call wait_for_saves() before reading the files
    back; multi-host-aware; the production choice for pod-scale runs).

    Durability note for the async backend: the returned paths may not
    exist yet. Orbax commits atomically (write to a tmp dir, rename), so
    a reader in ANY process sees either nothing or a complete
    checkpoint, and `latest_checkpoint`'s strict name match skips
    uncommitted tmp dirs; but a crash before the background write
    finishes loses that save — run()'s final wait_for_saves() is the
    in-process durability barrier."""
    d = Path(save_dir)
    d.mkdir(parents=True, exist_ok=True)
    (d / "options.json").write_text(opt.to_json())
    optim_tree = {"opt_state": state.opt_state, "step": state.step,
                  "epoch": epoch}
    if backend == "orbax":
        model_path = (d / f"model_{epoch}.orbax").resolve()
        optim_path = (d / f"optimState_{epoch}.orbax").resolve()
        _orbax_checkpointer("model").save(
            model_path, _host(state.params), force=True)
        _orbax_checkpointer("optim").save(
            optim_path, _host(optim_tree), force=True)
        return model_path, optim_path
    model_path = d / f"model_{epoch}.msgpack"
    optim_path = d / f"optimState_{epoch}.msgpack"
    model_path.write_bytes(_to_bytes(_host(state.params)))
    optim_path.write_bytes(_to_bytes(_host(optim_tree)))
    return model_path, optim_path


def latest_checkpoint(save_dir: str | Path) -> Tuple[Optional[Path], int]:
    """Newest model_<e> in a directory -> (path, epoch)
    (util.lua:127-140). (None, 0) when empty."""
    best, best_e = None, 0
    d = Path(save_dir)
    if d.is_dir():
        for p in d.glob("model_*"):
            m = re.fullmatch(r"model_(\d+)\.(msgpack|orbax)", p.name)
            if m and int(m.group(1)) > best_e:
                best, best_e = p, int(m.group(1))
    return best, best_e


def _load_options(path: Path) -> Optional[Options]:
    sidecar = path.parent / "options.json"
    if sidecar.exists():
        return Options.from_json(sidecar.read_text())
    return None


def load_model_checkpoint(path: str | Path, opt: Optional[Options] = None):
    """-> (params, model config). `path` may be a model_<e>.msgpack file
    or a directory containing them (newest wins); the options.json sidecar
    (or an explicit `opt`) says which netType's graph the tree belongs to."""
    import jax
    import jax.numpy as jnp

    from ..models.factory import model_and_config

    p = Path(path)
    # an .orbax checkpoint IS a directory; only scan non-checkpoint dirs
    if p.is_dir() and p.suffix != ".orbax":
        p, _ = latest_checkpoint(p)
        if p is None:
            raise FileNotFoundError(f"no model_<e> checkpoint under {path}")
    opt = opt or _load_options(p) or Options().derive()
    model, cfg = model_and_config(opt)

    if p.suffix == ".orbax":
        import orbax.checkpoint as ocp

        wait_for_saves()  # the file may still be landing asynchronously
        params = ocp.StandardCheckpointer().restore(p.resolve())
        return params, cfg

    # template tree for msgpack structure/dtype restoration
    h = 2 ** (opt.levels - 1)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, 2 * h, 3 * opt.frames), jnp.float32))["params"]
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    params = _from_bytes(template, p.read_bytes())
    return params, cfg


def load_train_checkpoint(save_dir: str | Path, opt: Options,
                          epoch: Optional[int] = None):
    """Full resume: -> (TrainState, next_epoch). Restores params AND
    optimizer moments (model.lua:51-130 retrain+optimState; -cont when
    `epoch` is None picks the newest)."""
    from .optim import make_optimizer
    from .state import TrainState

    d = Path(save_dir)
    if epoch is None:
        mp, epoch = latest_checkpoint(d)
        if mp is None:
            raise FileNotFoundError(f"no checkpoints under {save_dir}")
    else:
        mp = d / f"model_{epoch}.msgpack"
        if not mp.exists():
            mp = d / f"model_{epoch}.orbax"
    params, _ = load_model_checkpoint(mp, opt)

    import jax.numpy as jnp
    tx = make_optimizer(opt, epoch)
    target = {"opt_state": tx.init(params),
              "step": jnp.zeros((), jnp.int32), "epoch": 0}
    if mp.suffix == ".orbax":
        import orbax.checkpoint as ocp

        wait_for_saves()  # the file may still be landing asynchronously
        restored = ocp.StandardCheckpointer().restore(
            (d / f"optimState_{epoch}.orbax").resolve(), target)
    else:
        restored = _from_bytes(
            target, (d / f"optimState_{epoch}.msgpack").read_bytes())
    state = TrainState(params=params, opt_state=restored["opt_state"],
                       step=jnp.asarray(restored["step"]), epoch=epoch)
    return state, epoch + 1


def load_or_convert(opt: Options, rng=None):
    """The model.lua:38-142 startup decision tree -> (params, config, epoch0).

    Order: -cont auto-resume > -retrain (+convert_to_soft surgery) >
    fresh init.
    """
    import jax
    import jax.numpy as jnp

    from ..models.factory import model_and_config
    from ..models.surgery import convert_hard_to_soft

    rng = rng if rng is not None else jax.random.PRNGKey(opt.manualSeed)
    model, cfg = model_and_config(opt)
    h = 2 ** (opt.levels - 1)

    def fresh_params():
        return jax.jit(model.init)(
            rng, jnp.zeros((1, h, 2 * h, 3 * opt.frames)))["params"]

    if opt.cont:
        mp, epoch = latest_checkpoint(opt.save)
        if mp is not None:
            params, _ = load_model_checkpoint(mp, opt)
            return params, cfg, epoch + 1

    if opt.retrain != "none":
        if opt.convert_to_soft:
            # load hard weights into a past_flow graph (model.lua:56-116);
            # the named-tree surgery is specific to the PWC decoder stacks
            if opt.netType != "pwc":
                raise ValueError("convert_to_soft is a PWC recipe "
                                 f"(netType={opt.netType!r})")
            if not opt.past_flow:
                raise ValueError("convert_to_soft requires -past_flow 1 "
                                 "(the soft graph it converts into)")
            import dataclasses as _dc
            hard_opt = _dc.replace(opt, past_flow=False)
            hard_params, _ = load_model_checkpoint(opt.retrain, hard_opt)
            params = convert_hard_to_soft(hard_params, fresh_params())
        else:
            params, _ = load_model_checkpoint(opt.retrain, opt)
        return params, cfg, opt.epochNumber

    return fresh_params(), cfg, opt.epochNumber
