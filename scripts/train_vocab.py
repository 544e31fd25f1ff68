"""Train and ship the default BoW vocabulary (offline, once).

The reference ships ORBvoc.txt — a k=10, L=6 DBoW2 tree trained offline on
Flickr1M (reference: Vocabulary/ referenced by build.sh:20-22; absent from
this mount, SURVEY §7.7). This script is our counterpart trainer: it
harvests ORB descriptors from a spread of synthetic scenes (random
textures sample the binary-descriptor space much like random natural
patches) and trains a k-majority tree, saved as packaged arrays that
``place.vocabulary.load_default_vocabulary`` ships with the library.

Run on CPU:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/train_vocab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from orb_slam2_with_comment_tpu.dataio.synthetic import (
        SyntheticWorld, orbit_trajectory)
    from orb_slam2_with_comment_tpu.frontend import OrbExtractor
    from orb_slam2_with_comment_tpu.place.vocabulary import (
        save_vocabulary, train_vocabulary)

    ext = OrbExtractor(n_features=1000)
    all_desc = []
    for seed in range(8):
        world = SyntheticWorld(seed=seed)
        for R, t in orbit_trajectory(n_frames=6):
            img, _ = world.render(R, t)
            f = ext(jnp.asarray(np.clip(img, 0, 255).astype(np.uint8)))
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            all_desc.append(d)
    descs = np.concatenate(all_desc)
    print(f"training on {len(descs)} descriptors")
    voc = train_vocabulary(descs, k=10, levels=3, seed=0)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "orb_slam2_with_comment_tpu", "place",
        "data", "vocab_default.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vocabulary(voc, out)
    print(f"saved {voc.n_words}-word vocabulary -> {out}")


if __name__ == "__main__":
    main()
