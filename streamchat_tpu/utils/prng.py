"""PRNG discipline.

The reference mixes `np.random.choice`, `torch.randperm`, and `random.randint`
with no seeding (utiles.py:258,293,312). Here every stochastic op draws from an
explicit jax.random key threaded through a KeySeq, so seeded runs are
reproducible end to end.
"""

from __future__ import annotations

import jax


class KeySeq:
    """Stateful convenience splitter around a jax.random key.

    >>> ks = KeySeq(0)
    >>> k1 = ks()          # fresh subkey
    >>> k2, k3 = ks(2)     # two fresh subkeys
    """

    def __init__(self, seed_or_key) -> None:
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self, num: int = 1):
        keys = jax.random.split(self._key, num + 1)
        self._key = keys[0]
        if num == 1:
            return keys[1]
        return list(keys[1:])

    @property
    def key(self):
        return self._key
