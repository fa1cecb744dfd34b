import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import raytracer_tpu as rt
from raytracer_tpu import grad as gradmod

scene, cam = rt.models.obj_mesh_scene()
W = H = 256
SPP, D = 8, 4
target = jnp.zeros((H, W, 3), jnp.float32)
params = gradmod.extract_params(scene, ["tri_v0", "mat_color"])
loss = gradmod.make_loss_fn(scene, cam, target, width=W, height=H,
                            samples_per_pixel=SPP, depth=D, seed=1,
                            parity_plane_sign=False, engine="pallas")
lowered = jax.jit(jax.value_and_grad(loss)).lower(params)
txt = lowered.as_text()
import re
hits = set(re.findall(r"tensor<[^>]*10240[^>]*>", txt))
for h in sorted(hits):
    print(h)
print("---- lines with 65536 and 10240:")
for line in txt.splitlines():
    if "10240" in line and "65536" in line:
        print(line[:220])
        break
