"""Stage-by-stage parity debug: torch reference vs atmvfi_tpu (lite)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
import jax, jax.numpy as jnp

from refutil import import_reference
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.convert import convert_state_dict

ref = import_reference()

torch.manual_seed(0)
np.random.seed(0)

tmodel = ref.network_lite.Network(global_motion=True)
tmodel.eval()

variables = convert_state_dict(tmodel.state_dict())
cfg = get_config("lite")
net = Network(cfg)

B, H, W = 1, 64, 96
im0 = np.random.rand(B, H, W, 3).astype(np.float32)
im1 = np.random.rand(B, H, W, 3).astype(np.float32)
tim0 = torch.from_numpy(im0).permute(0, 3, 1, 2).contiguous()
tim1 = torch.from_numpy(im1).permute(0, 3, 1, 2).contiguous()

def cmp(name, jx, tx_nchw):
    a = np.asarray(jx)
    b = tx_nchw.detach().permute(0, 2, 3, 1).numpy() if tx_nchw.dim() == 4 else tx_nchw.detach().numpy()
    d = np.abs(a - b)
    print(f"{name:30s} shape {a.shape} max|d| {d.max():.3e} mean|d| {d.mean():.3e}")
    return d.max()

with torch.no_grad():
    # encoder
    tcat = torch.cat([tim0, tim1], 0)
    tx, tlevels = tmodel.shared_feat_extraction(tcat)

jcat = jnp.concatenate([jnp.asarray(im0), jnp.asarray(im1)], 0)
jx, jlevels = net.apply(variables, jcat, method=Network.shared_feat_extraction)
cmp("encoder coarsest", jx, tx)
for i, (jl, tl) in enumerate(zip(jlevels, tlevels)):
    cmp(f"encoder level{i}", jl, tl)

# fusion
with torch.no_grad():
    tfeat, th, tw = tmodel.cross_scale_feature_fusion(tlevels)
jfeat = net.apply(variables, jlevels, method=lambda m, xs: m.cross_scale_feature_fusion(xs))
cmp("fusion tokens", jfeat.reshape(2 * B, -1, jfeat.shape[-1]), tfeat)

# global motion
with torch.no_grad():
    tgf0, tgf1, tgocc = tmodel.estimate_global_motion(tx, list(tlevels))
jgf0, jgf1, jgocc = net.apply(variables, jx, jlevels, method=Network.estimate_global_motion)
cmp("global flow0", jgf0, tgf0)
cmp("global occ", jgocc, tgocc)

# local motion
with torch.no_grad():
    tfeat_bhwc = tfeat.view(2 * B, th, tw, -1)
    tf0, tf1, tocc, tfeat2, tout = tmodel.estimate_local_motion(tfeat_bhwc)
jf0, jf1, jocc, jfeat2, jout = net.apply(variables, jfeat, method=Network.estimate_local_motion)
cmp("local flow0", jf0, tf0)
cmp("local occ", jocc, tocc)
cmp("local out", jout, tout)

# full forward (global on)
with torch.no_grad():
    tres = tmodel(tim0, tim1)
fwd = jax.jit(net.apply, static_argnames=("global_motion", "ensemble_global_motion"))
jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1), global_motion=True)
cmp("I_t (global on)", jres["I_t"], tres["I_t"])
cmp("opt_flow_0", jres["opt_flow_0"], tres["opt_flow_0"])

# full forward (global off)
tmodel.global_motion = False
with torch.no_grad():
    tres2 = tmodel(tim0, tim1)
jres2 = fwd(variables, jnp.asarray(im0), jnp.asarray(im1), global_motion=False)
cmp("I_t (global off)", jres2["I_t"], tres2["I_t"])

# ensemble forward (B=2 to exercise the vectorized per-sample argmin)
tmodel.global_motion = True
tmodel.ensemble_global_motion = True
im0b = np.concatenate([im0, im1], 0)
im1b = np.concatenate([im1, im0], 0)
with torch.no_grad():
    tres3 = tmodel(torch.from_numpy(im0b).permute(0, 3, 1, 2),
                   torch.from_numpy(im1b).permute(0, 3, 1, 2))
jres3 = fwd(variables, jnp.asarray(im0b), jnp.asarray(im1b),
            global_motion=True, ensemble_global_motion=True)
cmp("I_t (ensemble)", jres3["I_t"], tres3["I_t"])
