"""Within-party device mesh: sharding the SNP / block axes over a party's
TPU chips.

The reference's intra-party parallelism is socket-sliced MPC threads and
goroutine matmult pipelines (SURVEY.md §2.9); here a party's chips form a
`jax.sharding.Mesh` with two axes:

  'blk' -- genotype block rows (the matmult contraction axis): partial
           modular accumulations combine with an ICI psum;
  'snp' -- SNP/diagonal/output axis: pure data parallelism (QC comparisons,
           diagonal products, per-SNP statistics shard without collectives).

Cross-party traffic stays at the protocol level (parallel/transport.py);
every chip of a party can derive identical PRG masks because the PRG is
counter-based (mpc/prg.py), so protocol masks never cross the wire.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class PartyMesh:
    def __init__(self, devices=None, blk: Optional[int] = None):
        devices = devices if devices is not None else jax.devices()
        n = len(devices)
        if blk is None:
            blk = 2 if n % 2 == 0 and n > 1 else 1
        snp = n // blk
        self.mesh = Mesh(np.array(devices[: blk * snp]).reshape(blk, snp), ("blk", "snp"))
        self.blk = blk
        self.snp = snp

    # -- placement helpers --------------------------------------------------

    def shard_snp(self, x, axis: int = 0):
        """Place an array with the SNP axis sharded over 'snp'."""
        spec = [None] * x.ndim
        spec[axis] = "snp"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def shard_blk(self, x, axis: int = 0):
        spec = [None] * x.ndim
        spec[axis] = "blk"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def replicate(self, x):
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    # -- sharded kernels ----------------------------------------------------

    def contract_modmac(self, A, D, q, mu, m32):
        """Sharded modular mult-accumulate: A [NB, nmod, N] (sharded 'blk'),
        D [NB, K, nmod, N] (sharded 'blk' x 'snp') ->
        sum_b A[b] * D[b, k] mod q, [K, nmod, N] sharded over 'snp'.

        The production layout of the BSGS matmult contraction
        (gwas/matmult.py) over multiple chips."""
        from jax.experimental.shard_map import shard_map

        from ..ops import rns

        qj, muj, m32j = jnp.asarray(q), jnp.asarray(mu), jnp.asarray(m32)

        def local(a_blk, d_blk):
            prod = rns.mul_mod_barrett(
                a_blk[:, None], d_blk, qj[None, None], muj[None, None]
            )
            part = jnp.sum(prod, axis=0, dtype=jnp.uint32)
            total = jax.lax.psum(part, "blk")
            qhat = rns._mulhi32(total, m32j)
            r = total - qhat * qj
            r = jnp.where(r >= qj, r - qj, r)
            return jnp.where(r >= qj, r - qj, r)

        return jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P("blk", None, None), P("blk", "snp", None, None)),
                out_specs=P("snp", None, None),
            )
        )(A, D)
