"""Full-state checkpoint / resume.

The reference's story is periodic output dumps reloadable as full
particle states (``pfreq`` snapshots; PySPH generic restart unused —
SURVEY.md §5).  Snapshots here hold only output fields, so a separate
*complete* checkpoint (every Scene field, including contact-slot springs
and per-body state) enables bit-exact resume: ``Solver`` rewrites
``checkpoint.npz`` every ``checkpoint_every`` output chunks (default 10
— a checkpoint costs a full-state host transfer + npz write) plus at
the final step, and ``--resume`` continues from it.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..state.scene import Scene


def save_checkpoint(path: str, scene: Scene, t: float, count: int) -> None:
    # one device->host transfer for the whole pytree (per-field
    # np.asarray costs a round trip each — see output.write_snapshot)
    import jax

    host = jax.device_get(scene.fields)
    data = {f"field/{k}": np.asarray(v) for k, v in host.items()}
    data["solver/t"] = np.float64(t)
    data["solver/count"] = np.int64(count)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, path)


def load_checkpoint(path: str, scene: Scene) -> Tuple[Scene, float, int]:
    """Restore fields into an already-constructed Scene (the meta/shape
    template comes from the app's ``create_particles``)."""
    with np.load(path) as z:
        fields = {}
        for k, v in scene.fields.items():
            key = f"field/{k}"
            if key in z.files:
                arr = z[key]
                ref = np.asarray(v)
                if arr.shape != ref.shape:
                    raise ValueError(
                        f"checkpoint field {k}: shape {arr.shape} != "
                        f"scene {ref.shape}")
                fields[k] = jnp.asarray(arr.astype(ref.dtype))
            else:
                fields[k] = v
        t = float(z["solver/t"])
        count = int(z["solver/count"])
    return Scene(fields, scene.meta), t, count


def latest_checkpoint(output_dir: str) -> Optional[str]:
    p = os.path.join(output_dir, "checkpoint.npz")
    return p if os.path.exists(p) else None
