"""Run the Pallas kernels compiled (not interpreted) on the real TPU and
compare against the lax reference implementations."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GANCTL_PALLAS"] = "1"
import numpy as np
import jax, jax.numpy as jnp

print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)

from gan_control_tpu.ops import pallas_kernels as pk
from gan_control_tpu.ops.fused_act import fused_leaky_relu
from gan_control_tpu.ops.upfirdn2d import upfirdn2d, make_kernel

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4, 64, 64, 128)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))

# fused bias + leaky relu (pallas vs formula)
y_p = np.asarray(pk.fused_bias_act(x, b))
y_ref = np.asarray(jnp.where(x + b >= 0, x + b, 0.2 * (x + b)) * np.sqrt(2.0))
print("fused_bias_act max_err:", np.abs(y_p - y_ref).max())

# upfirdn2d pallas path vs lax path
k = make_kernel((1, 3, 3, 1))
os.environ["GANCTL_PALLAS"] = "1"
up_p = np.asarray(upfirdn2d(x, k * 4.0, up=2, down=1, pad=(2, 1)))
os.environ["GANCTL_PALLAS"] = "0"
up_l = np.asarray(upfirdn2d(x, k * 4.0, up=2, down=1, pad=(2, 1)))
print("upfirdn up2 max_err:", np.abs(up_p - up_l).max())

os.environ["GANCTL_PALLAS"] = "1"
dn_p = np.asarray(upfirdn2d(x, k, up=1, down=2, pad=(1, 1)))
os.environ["GANCTL_PALLAS"] = "0"
dn_l = np.asarray(upfirdn2d(x, k, up=1, down=2, pad=(1, 1)))
print("upfirdn down2 max_err:", np.abs(dn_p - dn_l).max())

ok = (np.abs(y_p - y_ref).max() < 1e-5 and np.abs(up_p - up_l).max() < 1e-4
      and np.abs(dn_p - dn_l).max() < 1e-4)
print("PALLAS TPU SMOKE:", "OK" if ok else "FAIL")
