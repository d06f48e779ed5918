"""Reference .pt checkpoint file loading (wrapped + raw formats)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from atmvfi_tpu.convert import load_torch_checkpoint
from atmvfi_tpu.models import Network, get_config


def _make_ref_model():
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(3)
    m = ref.network_lite.Network(global_motion=True)
    m.eval()
    return m


def test_wrapped_trainer_checkpoint_loads(tmp_path):
    """The trainer's wrapped dict format (reference trainer.py:438-446)."""
    tmodel = _make_ref_model()
    path = str(tmp_path / "ckpt.pt")
    torch.save(
        {
            "model_state_dict": tmodel.state_dict(),
            "optimizer_state_dict": {"dummy": 1},
            "meta_data": {"epoch": 7},
            "train_metric": {"psnr": 30.0},
            "val_metric": {"psnr": 29.0},
        },
        path,
    )
    variables, meta = load_torch_checkpoint(path)
    assert meta["meta_data"]["epoch"] == 7
    net = Network(get_config("lite"))
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    out = jax.jit(net.apply)(variables, im, im)
    assert out["I_t"].shape == (1, 64, 64, 3)

    # raw state_dict fallback (demo_2x.py:27-36)
    raw_path = str(tmp_path / "raw.pt")
    torch.save(tmodel.state_dict(), raw_path)
    variables2, meta2 = load_torch_checkpoint(raw_path)
    assert meta2 == {}
    a = jax.tree.leaves(variables)[0]
    b = jax.tree.leaves(variables2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_strips_resolution_buffers(tmp_path):
    """Cached attn_mask/HW/relative_coord buffers must be ignored."""
    tmodel = _make_ref_model()
    with torch.no_grad():  # populate the shift-mask buffers
        x = torch.rand(2, 3, 64, 96)
        tmodel(x[:1], x[1:])
    sd = tmodel.state_dict()
    assert any(k.endswith(("attn_mask", "HW")) for k in sd)
    path = str(tmp_path / "with_buffers.pt")
    torch.save(sd, path)
    variables, _ = load_torch_checkpoint(path)  # must not raise
    from flax.traverse_util import flatten_dict

    keys = {"/".join(k) for k in flatten_dict(variables).keys()}
    assert not any("attn_mask" in k or "HW" in k for k in keys)
