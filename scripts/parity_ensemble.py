"""Ensemble-forward parity: torch reference vs atmvfi_tpu (lite, B=2)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
import jax.numpy as jnp

from refutil import import_reference
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.convert import convert_state_dict

ref = import_reference()
torch.manual_seed(0)
np.random.seed(0)

tmodel = ref.network_lite.Network(global_motion=True, ensemble_global_motion=True)
tmodel.eval()
variables = convert_state_dict(tmodel.state_dict())
net = Network(get_config("lite"))

B, H, W = 2, 128, 192
im0 = np.random.rand(B, H, W, 3).astype(np.float32)
im1 = np.random.rand(B, H, W, 3).astype(np.float32)
tim0 = torch.from_numpy(im0).permute(0, 3, 1, 2).contiguous()
tim1 = torch.from_numpy(im1).permute(0, 3, 1, 2).contiguous()

with torch.no_grad():
    tres = tmodel(tim0, tim1)

fwd = jax.jit(net.apply, static_argnames=("global_motion", "ensemble_global_motion"))
jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
           global_motion=True, ensemble_global_motion=True)

a = np.asarray(jres["I_t"])
b = tres["I_t"].permute(0, 2, 3, 1).numpy()
print(f"I_t (ensemble) max|d| {np.abs(a-b).max():.3e} mean|d| {np.abs(a-b).mean():.3e}")
