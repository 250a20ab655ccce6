"""Checkpointing: trainable-only partition, save/resume, torch .pt compat.

The reference trains only the two adapters + the new attn2 projections
(to_k_ip/to_v_ip) + LoRA (modeling_utils.py:62-88, train.py:366-372) and
checkpoints exactly that partial state as photoverse_{step:06}.pt with keys
{image_adapter, text_adapter, cross_attention_adapter, optimizer?,
lora_config?} (modeling_utils.py:29-50).

Here the same "trainable-only footprint" is a pytree partition:
  - `partition_params` splits PhotoVerseParams into (trainable, frozen) flat
    dicts keyed by path tuples — the optimizer/gradients only ever touch the
    trainable dict;
  - `save_progress` / `load_photoverse_checkpoint` write/read msgpack
    checkpoints of that partition, and `load_photoverse_checkpoint` also
    accepts the reference's torch .pt files (converted on load, including
    peft LoRA keys), so users can bring their released weights.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

from photoverse_tpu.models.assembly import PhotoVerseModules, PhotoVerseParams

__all__ = [
    "partition_params",
    "combine_params",
    "trainable_unet_mask_path",
    "save_progress",
    "save_progress_pt",
    "load_photoverse_checkpoint",
    "peek_lora_config",
]

_TRAINABLE_UNET_LEAVES = ("to_k_ip", "to_v_ip", "lora_A", "lora_B")


def trainable_unet_mask_path(path: Tuple[str, ...]) -> bool:
    """Is this UNet param path trainable? (new ip projections + LoRA only,
    matching requires_grad after freeze-then-patch, train.py:366-370)."""
    return any(p in _TRAINABLE_UNET_LEAVES for p in path)


def partition_params(params: PhotoVerseParams) -> Tuple[Dict, Dict]:
    """-> (trainable, frozen) flat dicts keyed by ("model", *path) tuples."""
    trainable: Dict = {}
    frozen: Dict = {}
    for name in ("text_adapter", "image_adapter"):
        for path, leaf in flatten_dict(getattr(params, name)).items():
            trainable[(name, *path)] = leaf
    for name in ("text_encoder", "vision_encoder", "vae"):
        for path, leaf in flatten_dict(getattr(params, name)).items():
            frozen[(name, *path)] = leaf
    for path, leaf in flatten_dict(params.unet).items():
        if trainable_unet_mask_path(path):
            trainable[("unet", *path)] = leaf
        else:
            frozen[("unet", *path)] = leaf
    return trainable, frozen


def combine_params(trainable: Dict, frozen: Dict) -> PhotoVerseParams:
    merged: Dict = {}
    for flat in (trainable, frozen):
        for key, leaf in flat.items():
            merged.setdefault(key[0], {})[key[1:]] = leaf
    return PhotoVerseParams(
        **{name: unflatten_dict(tree) for name, tree in merged.items()}
    )


def host_save_snapshot(params: PhotoVerseParams) -> PhotoVerseParams:
    """Minimal host (numpy) copy of `params` sufficient for save_progress
    AND save_progress_pt: the trainable partition plus the frozen attn2
    base to_q/to_k/to_v kernels — the .pt exporter emits those too, because
    the reference's cross_attention_adapter includes the (frozen) base
    projection weights alongside the LoRA/ip params (modeling_utils.py:33-38).
    Every other frozen leaf (the ~3.2 GB VAE/CLIP/UNet backbone) is dropped,
    so neither the synchronous writers nor AsyncCheckpointer.submit's
    blanket device->host snapshot ever fetch it — a measured 5-7 min per
    checkpoint boundary through the TPU tunnel."""
    trainable, frozen = partition_params(params)
    keep = {k: np.asarray(v) for k, v in trainable.items()}
    keep.update(
        {
            k: np.asarray(v)
            for k, v in frozen.items()
            if k[0] == "unet" and "attn2" in k
        }
    )
    merged: Dict = {
        name: {}
        for name in (
            "text_encoder", "vision_encoder", "unet", "vae",
            "text_adapter", "image_adapter",
        )
    }
    for key, leaf in keep.items():
        merged[key[0]][key[1:]] = leaf
    return PhotoVerseParams(
        **{name: unflatten_dict(tree) if tree else {} for name, tree in merged.items()}
    )


# ---------------------------------------------------------------------------
# native save/load (msgpack via flax.serialization)
# ---------------------------------------------------------------------------


def save_progress(
    output_dir: str,
    params: PhotoVerseParams,
    step: Optional[int] = None,
    lora_config: Optional[dict] = None,
    opt_state=None,
    final: bool = False,
) -> str:
    """Write the trainable partition (+ optional optimizer state) to
    photoverse_{step:06}.msgpack, mirroring save_progress
    (modeling_utils.py:29-50). Unlike the reference (which saves the
    optimizer but never restores it, SURVEY.md 5.4), load_progress restores
    optimizer state and the global step for true resume. `final=True` writes
    the unstepped photoverse.msgpack name while still embedding `step`, so
    resuming from a finished run's final checkpoint continues at its last
    step — the same semantics a boundary-coincident promoted final has."""
    trainable, _ = partition_params(params)
    payload = {
        "trainable": {"/".join(k): np.asarray(v) for k, v in trainable.items()},
    }
    if step is not None:
        payload["step"] = step
    if opt_state is not None:
        payload["optimizer"] = serialization.to_state_dict(opt_state)
    name = (
        "photoverse.msgpack"
        if final or step is None
        else f"photoverse_{step:06d}.msgpack"
    )
    path = os.path.join(output_dir, name)
    os.makedirs(output_dir, exist_ok=True)
    # atomic writes: a preemption mid-write must never leave a truncated
    # checkpoint as the newest resume candidate. The .lora.json sidecar
    # lands BEFORE the checkpoint file appears — the reverse order could
    # leave a LoRA checkpoint without its sidecar, which loads as a
    # rank-0 model that silently drops the LoRA weights (peek_lora_config)
    if lora_config is not None:
        side_tmp = path + ".lora.json.tmp"
        with open(side_tmp, "w") as f:
            json.dump(lora_config, f)
        os.replace(side_tmp, path + ".lora.json")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def _adapter_to_torch_sd(tree: dict) -> Dict[str, np.ndarray]:
    """Inverse of convert.torch_to_jax.convert_adapter: stacked params ->
    the reference PhotoVerseAdapter state-dict layout (adapters.py:5-28),
    nn.Sequential indices 0/1/3/4/6 under mapping_{i} / mapping_patch_{i}."""
    out: Dict[str, np.ndarray] = {}
    for branch_name, prefix in (("mapping", "mapping"), ("mapping_patch", "mapping_patch")):
        b = tree[branch_name]
        K = np.asarray(b["fc0_w"]).shape[0]
        for i in range(K):
            p = f"{prefix}_{i}"
            out[f"{p}.0.weight"] = np.asarray(b["fc0_w"][i]).T
            out[f"{p}.0.bias"] = np.asarray(b["fc0_b"][i])
            out[f"{p}.1.weight"] = np.asarray(b["ln0_g"][i])
            out[f"{p}.1.bias"] = np.asarray(b["ln0_b"][i])
            out[f"{p}.3.weight"] = np.asarray(b["fc1_w"][i]).T
            out[f"{p}.3.bias"] = np.asarray(b["fc1_b"][i])
            out[f"{p}.4.weight"] = np.asarray(b["ln1_g"][i])
            out[f"{p}.4.bias"] = np.asarray(b["ln1_b"][i])
            out[f"{p}.6.weight"] = np.asarray(b["fc2_w"][i]).T
            out[f"{p}.6.bias"] = np.asarray(b["fc2_b"][i])
    return out


def _torch_block_name(block: str) -> str:
    """My UNet block name -> the diffusers module path prefix."""
    if block == "mid_attn":
        return "mid_block.attentions.0"
    kind, i, _, j = block.split("_")
    return f"{kind}_blocks.{i}.attentions.{j}"


def _cross_attention_to_torch_sd(
    unet_params: dict, use_lora: bool
) -> Dict[str, np.ndarray]:
    """Inverse of _convert_cross_attention_adapter: emit exactly the key set
    the reference's save_progress extracts from the patched unet state dict
    (modeling_utils.py:33-38 — attn2 keys matching processor|to_q|to_k|to_v,
    with peft base_layer/lora_A/lora_B naming when LoRA is injected)."""
    out: Dict[str, np.ndarray] = {}
    for block, tree in unet_params.items():
        if "attn2" not in (tree or {}):
            continue
        base = _torch_block_name(block) + ".transformer_blocks.0.attn2"
        a = tree["attn2"]
        for proj in ("to_q", "to_k", "to_v"):
            p = a[proj]
            w = np.asarray(p["base"]["kernel"] if "base" in p else p["kernel"]).T
            if use_lora and "lora_A" in p:
                out[f"{base}.{proj}.base_layer.weight"] = w
                out[f"{base}.{proj}.lora_A.default.weight"] = np.asarray(p["lora_A"]).T
                out[f"{base}.{proj}.lora_B.default.weight"] = np.asarray(p["lora_B"]).T
            else:
                out[f"{base}.{proj}.weight"] = w
        out[f"{base}.processor.to_k_ip.0.weight"] = np.asarray(
            a["to_k_ip"]["kernel"]
        ).T
        out[f"{base}.processor.to_v_ip.0.weight"] = np.asarray(
            a["to_v_ip"]["kernel"]
        ).T
    return out


def save_progress_pt(
    output_dir: str,
    params: PhotoVerseParams,
    step: Optional[int] = None,
    lora_config: Optional[dict] = None,
    final: bool = False,
) -> str:
    """Write a reference-format photoverse_{step:06}.pt checkpoint
    ({image_adapter, text_adapter, cross_attention_adapter, lora_config?},
    modeling_utils.py:29-50) loadable by the reference's
    load_photoverse_model AND by load_photoverse_checkpoint here —
    round-trips torch users' weights back out of the TPU framework.
    `final=True` forces the unstepped photoverse.pt name (the reference
    format has no step field, so only the filename changes)."""
    import torch

    def to_torch(sd: Dict[str, np.ndarray]):
        return {k: torch.from_numpy(np.array(v, np.float32, copy=True))
                for k, v in sd.items()}

    use_lora = lora_config is not None
    payload = {
        "image_adapter": to_torch(_adapter_to_torch_sd(params.image_adapter)),
        "text_adapter": to_torch(_adapter_to_torch_sd(params.text_adapter)),
        "cross_attention_adapter": to_torch(
            _cross_attention_to_torch_sd(params.unet, use_lora)
        ),
    }
    if lora_config is not None:
        payload["lora_config"] = lora_config
    name = (
        "photoverse.pt" if final or step is None else f"photoverse_{step:06d}.pt"
    )
    path = os.path.join(output_dir, name)
    os.makedirs(output_dir, exist_ok=True)
    tmp = path + ".tmp"
    torch.save(payload, tmp)
    os.replace(tmp, path)
    return path


def _load_native(path: str, params: PhotoVerseParams) -> PhotoVerseParams:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    trainable, frozen = partition_params(params)
    loaded = {tuple(k.split("/")): jnp.asarray(v) for k, v in payload["trainable"].items()}
    missing = set(trainable) - set(loaded)
    if missing:
        raise ValueError(f"checkpoint missing {len(missing)} trainable keys: "
                         f"{sorted(missing)[:5]}...")
    return combine_params({k: loaded[k] for k in trainable}, frozen)


# ---------------------------------------------------------------------------
# torch .pt compatibility (reference checkpoint format)
# ---------------------------------------------------------------------------


def _convert_cross_attention_adapter(
    sd: Dict[str, np.ndarray], unet_params: dict
) -> dict:
    """Map reference `cross_attention_adapter` unet keys into my unet tree.

    Keys look like
      down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_q.weight
      ...attn2.processor.to_k_ip.0.weight
      ...attn2.to_q.lora_A.default.weight  (peft)
      ...attn2.to_q.base_layer.weight      (peft-wrapped base)
    """
    flat = flatten_dict(unet_params)
    pat = re.compile(
        r"(?P<block>down_blocks\.(?P<di>\d)|mid_block|up_blocks\.(?P<ui>\d))"
        r"\.attentions\.(?P<aj>\d)\.transformer_blocks\.0\.attn2\.(?P<rest>.+)"
    )
    for key, val in sd.items():
        m = pat.match(key)
        if m is None:
            continue
        if m.group("di") is not None:
            block = f"down_{m.group('di')}_attn_{m.group('aj')}"
        elif m.group("ui") is not None:
            block = f"up_{m.group('ui')}_attn_{m.group('aj')}"
        else:
            block = "mid_attn"
        rest = m.group("rest")
        arr = np.asarray(val)
        target = None
        if rest.startswith("processor.to_k_ip.0.weight"):
            target = (block, "attn2", "to_k_ip", "kernel"); arr = arr.T
        elif rest.startswith("processor.to_v_ip.0.weight"):
            target = (block, "attn2", "to_v_ip", "kernel"); arr = arr.T
        else:
            for proj in ("to_q", "to_k", "to_v"):
                if rest == f"{proj}.weight" or rest == f"{proj}.base_layer.weight":
                    target = (block, "attn2", proj, "base", "kernel"); arr = arr.T
                elif rest == f"{proj}.lora_A.default.weight":
                    target = (block, "attn2", proj, "lora_A"); arr = arr.T
                elif rest == f"{proj}.lora_B.default.weight":
                    target = (block, "attn2", proj, "lora_B"); arr = arr.T
                else:
                    continue
                break
        if target is not None and target in flat:
            flat[target] = jnp.asarray(arr, jnp.float32)
    return unflatten_dict(flat)


def peek_lora_config(path: str) -> Optional[dict]:
    """Read just the lora_config carried by a checkpoint (native sidecar
    json or the `lora_config` entry of a reference .pt), without building
    any model. The reference re-injects LoRA from this saved config before
    loading weights (modeling_utils.py:16-18) — load_models uses this to do
    the same, so a LoRA-trained checkpoint loads correctly even when the
    caller (e.g. the generate/serve CLIs) never passed LoRA flags."""
    if path.endswith(".msgpack"):
        lora_path = path + ".lora.json"
        return json.load(open(lora_path)) if os.path.exists(lora_path) else None
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return state.get("lora_config")


def load_photoverse_checkpoint(
    path: str, modules: PhotoVerseModules, params: PhotoVerseParams
) -> Tuple[PhotoVerseParams, Optional[dict]]:
    """Load either a native .msgpack or a reference torch .pt checkpoint
    (load_photoverse_model semantics, modeling_utils.py:13-26)."""
    if path.endswith(".msgpack"):
        lora_path = path + ".lora.json"
        lora = json.load(open(lora_path)) if os.path.exists(lora_path) else None
        return _load_native(path, params), lora

    import torch

    from photoverse_tpu.convert.torch_to_jax import convert_adapter

    state = torch.load(path, map_location="cpu", weights_only=False)
    lora_config = state.get("lora_config")
    K = modules.num_tokens

    def np_sd(d):
        return {k: v.numpy() for k, v in d.items()}

    if "image_adapter" in state:
        params.image_adapter = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            convert_adapter(np_sd(state["image_adapter"]), num_tokens=K),
        )
    if "text_adapter" in state:
        params.text_adapter = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            convert_adapter(np_sd(state["text_adapter"]), num_tokens=K),
        )
    if "cross_attention_adapter" in state:
        params.unet = _convert_cross_attention_adapter(
            np_sd(state["cross_attention_adapter"]), params.unet
        )
    return params, lora_config


class AsyncCheckpointer:
    """Background checkpoint writes so the train loop never blocks on I/O.

    The device->host snapshot happens synchronously on submit (arrays must be
    copied out before the next step's donation reuses their buffers); the
    expensive part — msgpack/torch serialization + disk write — runs on a
    single worker thread. `wait()` drains pending writes (call before exit
    and before any load of a just-written file). Errors surface on the next
    submit()/wait() call rather than being swallowed."""

    def __init__(self):
        import queue as _queue
        import threading as _threading

        self._q: "_queue.Queue" = _queue.Queue()
        self._error = None
        self._done = _threading.Event()
        self._thread = _threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as e:  # surfaced on next submit/wait
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def submit(self, fn, *args, **kwargs):
        """Snapshot jax arrays in args/kwargs to host numpy, then enqueue."""
        self._check()
        host = lambda t: jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, t
        )
        self._q.put((fn, tuple(host(a) for a in args),
                     {k: host(v) for k, v in kwargs.items()}))

    def wait(self):
        self._q.join()
        self._check()

    def close(self):
        try:
            self.wait()
        finally:
            # shut the worker down even when wait() re-raises a stored
            # write error — close() must always be the flush point
            self._q.put(None)
            self._thread.join()


def load_progress(
    path: str,
    params: PhotoVerseParams,
    opt_state_template=None,
):
    """Full training resume from a native checkpoint: returns
    (params, opt_state or None, step). The reference's resume is
    weights-only with the step reset to 0 (SURVEY.md 5.4); this restores
    everything."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    trainable, frozen = partition_params(params)
    loaded = {tuple(k.split("/")): jnp.asarray(v) for k, v in payload["trainable"].items()}
    missing = set(trainable) - set(loaded)
    if missing:
        # same clear diagnostic as _load_native — a config-mismatched resume
        # (e.g. --lora_rank set but the checkpoint trained without LoRA)
        # should not die in a bare KeyError
        raise ValueError(f"checkpoint missing {len(missing)} trainable keys: "
                         f"{sorted(missing)[:5]}...")
    params = combine_params({k: loaded[k] for k in trainable}, frozen)
    opt_state = None
    if opt_state_template is not None and "optimizer" in payload:
        opt_state = serialization.from_state_dict(
            opt_state_template, payload["optimizer"]
        )
    step = int(payload.get("step", 0))
    return params, opt_state, step
