"""Collective (multiparty) CKKS protocols.

Re-implementation of the reference's mpc/mhe.go + mpc/aggregate.go on top of
crypto/ckks.py:

* CollectiveInit: per-party ternary key shard; collective public key (CKG),
  2-round relinearization key (RKG), rotation keys (RTG) over a
  common-reference-polynomial stream seeded from the global PRG
  (mpc/mhe.go:24-81);
* collective decrypt: switch-to-zero-key shares aggregated via the hub
  (mpc/mhe.go:107-220);
* collective bootstrap: masked decryption -> exact recode to the top modulus
  -> masked re-encryption (mpc/mhe.go:222-379); masks are power-of-two
  bounded and handled in vectorized word arithmetic (ops/rns.py), never
  decoded;
* hub-rooted aggregation trees for shares / ciphertexts / vectors
  (mpc/aggregate.go:15-500).

Party 0 (the MPC dealer) holds a zero key shard and participates in nothing
here except where the reference does.
"""

from __future__ import annotations

import os
import threading
import weakref
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import ckks as C
from ..crypto.params import CkksParams, get_params
from ..ops import rns
from ..ops.rns import _sel, add_mod, mul_mod_barrett, neg_mod, ntt, sub_mod
from ..parallel.transport import Network
from ..utils.log import log
from ..utils import prof


@dataclass
class CryptoParams:
    """The bundle passed around the GWAS layers (reference CryptoParams,
    crypto/crypto.go:45-87)."""

    ctx: C.CkksContext
    sk: C.SecretKey  # this party's shard (zeros for party 0)
    pk: C.PublicKey
    rlk: Optional[C.KSwitchKey]
    rot_keys: Dict[int, C.KSwitchKey] = field(default_factory=dict)
    enc_rng: np.random.Generator = None
    # True iff this key bundle was RESTORED from the key cache -- the only
    # case in which ciphertexts cached by an earlier run are decryptable
    # (fresh collective keygen invalidates every stored ciphertext)
    keys_from_cache: bool = False
    _kstack: Dict = field(default_factory=dict, repr=False)

    @property
    def params(self) -> CkksParams:
        return self.ctx.params

    @property
    def slots(self) -> int:
        return self.ctx.params.slots

    # device budget for cached level-sliced rotation-key stacks; rotation
    # keys themselves stay HOST-resident (a full PN14 set is ~11 GB,
    # VERDICT.md missing #2) and only the slices a workload touches move
    # on-device
    _KSTACK_BUDGET = int(os.environ.get("SFGWAS_KSTACK_BYTES", 4 * 1024**3))

    @property
    def rot_nmod(self) -> int:
        """Highest level rotation keys exist for.  Keys are generated and
        stored SLICED to the matmult working band (mm_nmod): rotations only
        ever run there (rotation-bearing ops clamp first), which cuts the
        PN14 key set from ~11 GB to ~2 GB and keeps it device-resident."""
        if not self.rot_keys:
            return self.ctx.nq
        any_key = next(iter(self.rot_keys.values()))
        return int(any_key.d0.shape[0])

    def clamp_rot(self, ct: C.Ciphertext) -> C.Ciphertext:
        """Drop a ciphertext into the rotation-key band (level drops are
        value-lossless)."""
        band = self.rot_nmod
        return self.ctx.drop_to(ct, band) if ct.nmod > band else ct

    def stacked_keys(self, gelems, nmod: int):
        """Rotation keys for the given Galois elements, stacked and sliced to
        the active level: ([B, nmod, nmod+1, N], [B, ...]) device arrays for
        the batched keyswitch (ckks.keyswitch_decomposed_b).  Cached per
        (gelems, nmod) -- the BSGS baby/giant sets recur every matmult.

        Keys are stored pre-sliced to [rot_nmod, rot_nmod+1, N] (their sp
        row is the LAST row of the stored slice)."""
        assert nmod <= self.rot_nmod, (
            f"rotation at nmod={nmod} above the key band {self.rot_nmod}; "
            "clamp the ciphertext first (clamp_rot)"
        )
        key = (tuple(gelems), nmod)
        if key not in self._kstack:
            some = self.rot_keys[gelems[0]]
            ridx = np.asarray(
                tuple(range(nmod)) + (int(some.d0.shape[1]) - 1,)
            )
            d0 = jnp.stack(
                [jnp.asarray(self.rot_keys[g].d0)[:nmod][:, ridx]
                 for g in gelems]
            )
            d1 = jnp.stack(
                [jnp.asarray(self.rot_keys[g].d1)[:nmod][:, ridx]
                 for g in gelems]
            )
            used = sum(a.nbytes + b.nbytes for a, b in self._kstack.values())
            if used + d0.nbytes + d1.nbytes > self._KSTACK_BUDGET:
                return d0, d1  # over budget: serve uncached
            self._kstack[key] = (d0, d1)
        return self._kstack[key]

    def stacked_keys_inv(self, gelems, nmod: int):
        """Stacked keys pre-permuted by sigma_g^{-1} along the slot axis,
        for the batched hoisted/grouped rotation kernels
        (ckks.hoisted_rotations_all): sigma(ext)*k == sigma(ext*sigma^{-1}k)
        lets the kernel permute only the final [.., nmod, N] result.  Cached
        per (gelems, nmod) beside the plain stacks."""
        key = ("inv", tuple(gelems), nmod)
        if key not in self._kstack:
            # built straight from the (host/mmap) key store so the plain
            # device stack is not also resident for this gelem set
            some = self.rot_keys[gelems[0]]
            ridx = np.asarray(tuple(range(nmod)) + (int(some.d0.shape[1]) - 1,))
            # gather on HOST (keys live host/mmap-resident): the device never
            # holds both the plain and the permuted stack at once
            i0 = np.empty(
                (len(gelems), nmod, len(ridx), self.ctx.n), np.uint32
            )
            i1 = np.empty_like(i0)
            for x, g in enumerate(gelems):
                ip = np.asarray(self.ctx._iperm_for(g))
                i0[x] = np.asarray(self.rot_keys[g].d0)[:nmod][:, ridx][..., ip]
                i1[x] = np.asarray(self.rot_keys[g].d1)[:nmod][:, ridx][..., ip]
            i0 = jnp.asarray(i0)
            i1 = jnp.asarray(i1)
            used = sum(a.nbytes + b.nbytes for a, b in self._kstack.values())
            if used + i0.nbytes + i1.nbytes > self._KSTACK_BUDGET:
                return i0, i1
            self._kstack[key] = (i0, i1)
        return self._kstack[key]

    def rotate(self, ct: C.Ciphertext, k: int) -> C.Ciphertext:
        """Single left rotation through the cached level-sliced key path."""
        k = k % self.slots
        if k == 0:
            return ct.copy()
        ct = self.clamp_rot(ct)
        g = self.ctx.galois_for_rotation(k)
        d0, d1 = self.stacked_keys([g], ct.nmod)
        r0, r1 = self.ctx.rotate_batch(ct.c0[None], ct.c1[None], [g], d0, d1, ct.nmod)
        return C.Ciphertext(r0[0], r1[0], ct.nmod, ct.scale)

    def conjugate(self, ct: C.Ciphertext) -> C.Ciphertext:
        g = self.ctx.galois_conjugate()
        ct = self.clamp_rot(ct)
        d0, d1 = self.stacked_keys([g], ct.nmod)
        r0, r1 = self.ctx.rotate_batch(ct.c0[None], ct.c1[None], [g], d0, d1, ct.nmod)
        return C.Ciphertext(r0[0], r1[0], ct.nmod, ct.scale)


_crp_sample = C.device_uniform_b  # counter-based device uniform (ckks.py)


class CrpStream:
    """Common-reference polynomial stream.

    Draw i is derived STATELESSLY from (seed, i) via a fresh Philox key, so
    every party computes identical values with no shared generator state --
    and colocated parties (local-sim threads) share ONE physical buffer per
    draw through a process-wide memo.  The CRP is public common data, so
    sharing buffers does not change the trust model; it matters because
    fresh pages fault in at ~10 MB/s on lazily-backed VMs, making duplicate
    identical gigabytes the dominant keygen cost."""

    _memo: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()
    _lock = threading.Lock()

    def __init__(self, seed: int):
        self.seed = int(seed) & ((1 << 64) - 1)
        self.i = 0

    def uniform_b(self, ctx, rows, batch: int):
        """[batch, len(rows), N] uint32 residues, DEVICE-resident.

        Sampled with counter-based threefry ON DEVICE (bit-exact identical
        on every backend, so all parties derive the same CRP), folding a
        64-bit draw per residue: val = (hi*(2^32 mod q) + lo) mod q, with
        the 32x32 products through the Barrett kernel (statistical distance
        < 2^-38 from uniform for our < 2^26 primes).  Colocated parties
        (local-sim threads) share ONE device buffer per draw through the
        process-wide memo; jax arrays are immutable so sharing is safe."""
        idx = self.i
        self.i += 1
        key = (self.seed, idx, tuple(rows), batch, ctx.n)
        with self._lock:
            hit = self._memo.get(key)
            if hit is not None:
                return hit
            val = _crp_sample(
                ctx,
                tuple(rows),
                batch,
                (
                    np.uint32(self.seed & 0xFFFFFFFF),
                    np.uint32(self.seed >> 32),
                ),
                np.uint32(idx),
            )
            self._memo[key] = val
            return val

    def uniform(self, ctx, rows) -> np.ndarray:
        return self.uniform_b(ctx, rows, 1)[0]


def generate_rot_shifts(slots: int, small_dim: int = 20) -> List[int]:
    """Rotation shifts to generate keys for (crypto/crypto.go:232-275):
    powers of two (both directions), BSGS baby steps 1..d-1 and giant steps
    g*d (left; both directions kept for the backward QR pass), plus small
    right shifts up to small_dim."""
    import math

    shifts = set()
    p = 1
    while p < slots:
        shifts.add(p % slots)
        shifts.add((slots - p) % slots)
        p *= 2
    for k in range(1, small_dim + 1):
        shifts.add(k % slots)
        shifts.add((slots - k) % slots)
    d = int(math.ceil(math.sqrt(slots)))
    for b in range(1, d):
        shifts.add(b)
    for g in range(1, d + 1):
        shifts.add((g * d) % slots)
        shifts.add((slots - g * d) % slots)
    shifts.discard(0)
    return sorted(shifts)


def collective_init(
    net: Network,
    params_name: str,
    extra_shifts: Optional[List[int]] = None,
    shifts_override: Optional[List[int]] = None,
    key_cache: Optional[str] = None,
    rot_key_nmod: Optional[int] = None,
) -> CryptoParams:
    """Interactive collective key generation (mpc/mhe.go:24-81).
    shifts_override replaces the default rotation-key set (tests / reduced
    deployments).  key_cache names a per-party .npz file: when present the
    whole key bundle (this party's shard + collective keys) is restored
    without the interactive protocol — an iteration aid for repeated runs on
    one machine, in the spirit of the reference's cached decrypted
    intermediates (gwas/gwas.go:333-360); NOT for production deployments."""
    params = get_params(params_name)
    ctx = C.CkksContext(params)
    pid = net.pid
    log(f"pid{pid} collective init start ({params_name})")

    kdir = key_cache + ".d" if key_cache else None
    if kdir and os.path.exists(os.path.join(kdir, "meta.npz")):
        # directory cache: one memory-mapped stack for all rotation keys --
        # restore is instant (pages fault in lazily as slices are used)
        z = np.load(os.path.join(kdir, "meta.npz"))
        rk0 = np.load(os.path.join(kdir, "rk0.npy"), mmap_mode="r")
        rk1 = np.load(os.path.join(kdir, "rk1.npy"), mmap_mode="r")
        rot_keys = {
            int(g): C.KSwitchKey(rk0[i], rk1[i])
            for i, g in enumerate(z["gelems"])
        }
        log(f"pid{pid} keys restored from {kdir}")
        return CryptoParams(
            ctx,
            C.SecretKey(jnp.asarray(z["sk"])),
            C.PublicKey(jnp.asarray(z["pk0"]), jnp.asarray(z["pk1"])),
            C.KSwitchKey(jnp.asarray(z["rlk0"]), jnp.asarray(z["rlk1"])),
            rot_keys,
            np.random.default_rng(),
            keys_from_cache=True,
        )
    if key_cache and os.path.exists(key_cache):
        z = np.load(key_cache)
        rot_keys = {}
        for g in z["gelems"]:
            rot_keys[int(g)] = C.KSwitchKey(z[f"rk0_{g}"], z[f"rk1_{g}"])
        log(f"pid{pid} keys restored from {key_cache}")
        cps = CryptoParams(
            ctx,
            C.SecretKey(jnp.asarray(z["sk"])),
            C.PublicKey(jnp.asarray(z["pk0"]), jnp.asarray(z["pk1"])),
            C.KSwitchKey(jnp.asarray(z["rlk0"]), jnp.asarray(z["rlk1"])),
            rot_keys,
            np.random.default_rng(),
            keys_from_cache=True,
        )
        # migrate the legacy single-zip cache to the mmap'd directory format
        # and drop the zip (~2.3 GB of dead weight per party otherwise)
        _save_key_dir(kdir, cps.sk, cps.pk, cps.rlk, rot_keys)
        z.close()
        os.remove(key_cache)
        log(f"pid{pid} legacy key cache migrated to {kdir}")
        return cps

    # CRP stream: seeded from the globally shared PRG (mpc/mhe.go:49-59)
    with net.rand.using(-1) as g:
        crp_seed = int.from_bytes(g.bytes(8), "little")
    crp_rng = CrpStream(crp_seed)
    enc_rng = np.random.default_rng()  # local randomness

    # secret shard (party 0: zero key, mpc/mhe.go:32-35)
    if pid == 0:
        sk = C.SecretKey(jnp.zeros((ctx.nq + 1, ctx.n), jnp.uint32))
    else:
        sk = ctx.gen_secret_key(enc_rng)

    pk = collective_pubkey_gen(net, ctx, sk, crp_rng)
    log(f"pid{pid} pubkey done")
    rlk = collective_relin_keygen(net, ctx, sk, crp_rng)
    log(f"pid{pid} relin key done")

    rot_keys: Dict[int, C.KSwitchKey] = {}
    if shifts_override is not None:
        shifts = sorted({s % params.slots for s in shifts_override} - {0})
    else:
        shifts = generate_rot_shifts(params.slots)
    if extra_shifts:
        shifts = sorted(set(shifts) | set(s % params.slots for s in extra_shifts))
    gelems = sorted({ctx.galois_for_rotation(s) for s in shifts} | {ctx.galois_conjugate()})
    key_nmod = rot_key_nmod or ctx.params.mm_nmod
    chunk = 8
    for c0 in range(0, len(gelems), chunk):
        log(f"pid{pid} rotkeys {c0}/{len(gelems)}")
        rot_keys.update(
            collective_rotkey_gen_many(
                net, ctx, sk, gelems[c0 : c0 + chunk], crp_rng, chunk,
                key_nmod=key_nmod,
            )
        )
    log(f"pid{pid} collective init done")

    if key_cache:
        _save_key_dir(kdir, sk, pk, rlk, rot_keys)
        log(f"pid{pid} keys cached to {kdir}")

    return CryptoParams(ctx, sk, pk, rlk, rot_keys, enc_rng)


def _save_key_dir(kdir, sk, pk, rlk, rot_keys):
    """Directory key-cache format: small keys in meta.npz, rotation keys as
    two raw stacked .npy files (sequential write; the old single .npz
    funneled ~2 GB through zipfile, ~3 min per party)."""
    os.makedirs(kdir, exist_ok=True)
    order = sorted(rot_keys)
    np.save(
        os.path.join(kdir, "rk0.npy"),
        np.stack([np.asarray(rot_keys[g].d0) for g in order]),
    )
    np.save(
        os.path.join(kdir, "rk1.npy"),
        np.stack([np.asarray(rot_keys[g].d1) for g in order]),
    )
    np.savez(
        os.path.join(kdir, "meta.npz"),
        sk=np.asarray(sk.s),
        pk0=np.asarray(pk.p0),
        pk1=np.asarray(pk.p1),
        rlk0=np.asarray(rlk.d0),
        rlk1=np.asarray(rlk.d1),
        gelems=np.asarray(order, np.int64),
    )


def _aggregate_mod(net: Network, ctx: C.CkksContext, x, rows):
    """Aggregate NTT-domain residue arrays modularly across data parties
    (party 0 excluded, mirroring the pid>0 guards of mpc/aggregate.go),
    hub-rooted.  Arrays stay on-device end to end over the zero-copy local
    transport (readback through the tunnel is ~100x slower than upload)."""
    if net.pid == 0:
        return jnp.asarray(x)
    t = _sel(ctx.basis, rows)

    def add_fn(a, b):
        return add_mod(jnp.asarray(a), jnp.asarray(b), t["q"])

    out = net.aggregate(x, add_fn)
    return jnp.asarray(out)


def collective_pubkey_gen(net: Network, ctx, sk, crp_rng) -> C.PublicKey:
    """CKG (mpc/mhe.go:83-105): share_i = -crp*s_i + e_i."""
    rows = ctx.full_rows
    t = _sel(ctx.basis, rows)
    crp = jnp.asarray(crp_rng.uniform(ctx, rows))  # same on all parties
    if net.pid == 0:
        share = jnp.zeros((ctx.nq + 1, ctx.n), jnp.uint32)
    else:
        e = ctx.small_to_rns(ctx.sample_gauss(np.random.default_rng()), rows)
        share = add_mod(
            neg_mod(mul_mod_barrett(crp, sk.s, t["q"], t["mu"]), t["q"]), e, t["q"]
        )
    p0 = _aggregate_mod(net, ctx, share, rows)
    # party 0 receives the aggregate as well (reference sends it pk via hub)
    if net.pid == 0:
        p0 = jnp.asarray(net.recv(net.hub_pid))
    elif net.pid == net.hub_pid:
        net.send(np.asarray(p0), 0)
    return C.PublicKey(p0, crp)


def _gauss_b(ctx, rng, batch: int) -> np.ndarray:
    return np.stack([ctx.sample_gauss(rng) for _ in range(batch)])


def collective_relin_keygen(net: Network, ctx, sk, crp_rng) -> C.KSwitchKey:
    """2-round RKG (mpc/mhe.go:478-502 structure), all digits batched.

    R1: h_j = sum_i (-u_i a_j + g_j s_i + e);  g_j = (P mod q_j) 1_{row j}
    R2: V_j = sum_i (s_i h_j + e)  and  W_j = sum_i (u_i a_j + e)
    Key: k0_j = V_j (= -u a_j s + g_j s^2 + e), k1_j = W_j (= u a_j + e):
    k0_j + s k1_j = g_j s^2 + noise."""
    rows = ctx.full_rows
    t = _sel(ctx.basis, rows)
    pid = net.pid
    rng = np.random.default_rng()

    if pid == 0:
        # zero key at the dealer (never used on real ciphertexts; the
        # dealer is outside the aggregation tree): skip draws and shares
        z = jnp.zeros((ctx.nq, ctx.nq + 1, ctx.n), jnp.uint32)
        return C.KSwitchKey(z, z)
    a_all = jnp.asarray(crp_rng.uniform_b(ctx, rows, ctx.nq))  # [nq, nq+1, N]
    u_ntt = ctx.small_to_rns(ctx.sample_ternary(rng), rows)
    e = ctx.small_to_rns_b(_gauss_b(ctx, rng, ctx.nq), rows)
    h_shares = ctx.kswitch_share(u_ntt, sk.s, a_all, e)
    # one aggregation message for all digits (the reference aggregates
    # per-poly; batching cuts round count by beta)
    h_agg = _aggregate_mod(net, ctx, h_shares, rows)

    q, mu = t["q"][None], t["mu"][None]
    e1 = ctx.small_to_rns_b(_gauss_b(ctx, rng, ctx.nq), rows)
    e2 = ctx.small_to_rns_b(_gauss_b(ctx, rng, ctx.nq), rows)
    v_sh = add_mod(mul_mod_barrett(sk.s[None], h_agg, q, mu), e1, q)
    w_sh = add_mod(mul_mod_barrett(u_ntt[None], a_all, q, mu), e2, q)
    d0 = _aggregate_mod(net, ctx, v_sh, rows)
    d1 = _aggregate_mod(net, ctx, w_sh, rows)
    return C.KSwitchKey(d0, d1)


def collective_rotkey_gen_many(
    net: Network, ctx, sk, gelems, crp_rng, chunk: int = 8,
    key_nmod: Optional[int] = None,
) -> Dict[int, C.KSwitchKey]:
    """RTG for many Galois elements (mpc/mhe.go:381-476): each party's share
    is a switching key from sigma_g(s_i) to s_i summed across parties.  All
    digits of a key are generated in one batched pass, and `chunk` keys share
    one aggregation round (the reference parallelizes over goroutines;
    batching serves the same end with ~beta*chunk fewer messages).

    key_nmod restricts each key to its first key_nmod digits and rows
    (0..key_nmod-1, special): rotations only ever run at the matmult
    working band (every rotation-bearing op clamps there, basics.py), so
    generating and holding the full [nq, nq+1, N] gadget is pure waste --
    a full PN14 set is ~11 GB while the sliced set is ~2 GB and lives
    entirely on-device (no device->host readback, VERDICT.md next #4)."""
    key_nmod = min(key_nmod or ctx.nq, ctx.nq)
    rows = tuple(range(key_nmod)) + (ctx.sp_row,)
    pid = net.pid
    nr, n = len(rows), ctx.n
    rng = np.random.default_rng()
    out: Dict[int, C.KSwitchKey] = {}
    for c0 in range(0, len(gelems), chunk):
        gs = gelems[c0 : c0 + chunk]
        B = len(gs)
        if pid == 0:
            # party 0's keys are zero shares and never touch a real
            # ciphertext (its ops mirror on dummies); skip the CRP draws and
            # share compute entirely.  Its crp_rng desyncs here, which is
            # safe: all later shared randomness uses fresh per-call seeds.
            z = jnp.zeros((key_nmod, nr, n), jnp.uint32)
            for g_el in gs:
                out[g_el] = C.KSwitchKey(z, z)
            continue
        # whole chunk in batched kernels: one CRP draw, one noise batch, one
        # stacked automorphism, one fused share kernel
        a_all = crp_rng.uniform_b(ctx, rows, B * key_nmod).reshape(
            B, key_nmod, nr, n
        )
        e_all = ctx.small_to_rns_b(
            _gauss_b(ctx, rng, B * key_nmod), rows
        ).reshape(B, key_nmod, nr, n)
        s_g = ctx.automorphism_many(sk.s, gs)  # [B, nq+1, n]
        shares = ctx.kswitch_share_many_sliced(sk.s, s_g, a_all, e_all, key_nmod)
        d0 = _aggregate_mod(net, ctx, shares, rows)
        for i, g_el in enumerate(gs):
            # device-resident, pre-sliced: stacked_keys() serves level
            # slices without any host round-trip
            out[g_el] = C.KSwitchKey(d0[i], a_all[i])
    return out


def collective_rotkey_gen(
    net: Network, ctx, sk, g_el: int, crp_rng, key_nmod: Optional[int] = None
) -> C.KSwitchKey:
    return collective_rotkey_gen_many(
        net, ctx, sk, [g_el], crp_rng, key_nmod=key_nmod
    )[g_el]


# ---------------------------------------------------------------------------
# collective decrypt / bootstrap


def collective_decrypt(net: Network, cps: CryptoParams, ct: C.Ciphertext, source_pid: int):
    """Returns the plaintext (all data parties; None at party 0)
    (mpc/mhe.go:107-220).  source_pid > 0 broadcasts first; <= 0 means the
    ciphertext is already known to every data party."""
    out = collective_decrypt_many(net, cps, [ct], source_pid)
    return out[0] if out else None


def _nmod_groups(cts):
    """Deterministic grouping of ct indices by level; identical at every
    data party because the ct lists are lockstep-shared."""
    groups: Dict[int, List[int]] = {}
    for i, ct in enumerate(cts):
        groups.setdefault(ct.nmod, []).append(i)
    return sorted(groups.items())


def collective_decrypt_many(net: Network, cps: CryptoParams, cts, source_pid: int):
    """Batched collective decrypt: ONE aggregation round per level group
    instead of one per ciphertext (the reference fires a goroutine per ct,
    mpc/mhe.go:107-220; batching the [B, nmod, N] stack through a single
    masked-key-switch kernel is the TPU shape of the same parallelism)."""
    if net.pid == 0:
        return None
    ctx = cps.ctx
    if source_pid > 0:
        cts = broadcast_cvec(net, cps, cts, source_pid)
    out = [None] * len(cts)
    for nmod, idxs in _nmod_groups(cts):
      with prof.span("col_decrypt"):
        rows = tuple(range(nmod))
        t = _sel(ctx.basis, rows)
        B = len(idxs)
        c0s = jnp.stack([cts[i].c0 for i in idxs])
        c1s = jnp.stack([cts[i].c1 for i in idxs])
        e = ctx.small_to_rns_b(
            np.stack([ctx.sample_gauss(cps.enc_rng, sigma=6.36) for _ in range(B)]),
            rows,
        )
        share = add_mod(
            mul_mod_barrett(c1s, cps.sk.s[None, :nmod], t["q"][None], t["mu"][None]),
            e,
            t["q"],
        )
        agg = _aggregate_mod(net, ctx, share, rows)
        m = add_mod(c0s, agg, t["q"])
        for b, i in enumerate(idxs):
            out[i] = C.Plaintext(m[b], nmod, cts[i].scale)
    return out


def collective_bootstrap(net: Network, cps: CryptoParams, ct: C.Ciphertext, source_pid: int):
    """Refresh to the top level (mpc/mhe.go:222-261): masked decryption ->
    exact recode -> masked re-encryption.  Returns the refreshed ciphertext
    (party 0: returns input)."""
    if net.pid == 0:
        return ct
    return collective_bootstrap_many(net, cps, [ct], source_pid)[0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _bs_share_kernel(
    ctx, rows, tgt_rows, B, nwords, top_bits, seed, idx, crp, c1s, sk, e1, e2
):
    """One fused kernel for a party's whole refresh share: sample the
    decryption mask (threefry words, centered), fold it mod both prime
    sets, NTT both, and form h1 = c1*s + e1 + mask_l,
    h2 = -crp*s + e2 - mask_f.  Replaces ~15 host steps + eager dispatches
    (each a tunnel round trip) per bootstrap call."""
    t_l = _sel(ctx.basis, rows)
    t_f = _sel(ctx.basis, tgt_rows)
    n = ctx.n
    k = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed[0]), seed[1]), idx
    )
    w = jax.random.bits(k, (nwords, B, n), dtype=jnp.uint32)
    w = (w & jnp.uint32((1 << 24) - 1)).astype(jnp.int32)
    top = w[-1] & jnp.int32((1 << top_bits) - 1)
    w = w.at[-1].set(top - jnp.int32(1 << (top_bits - 1)))

    def fold(rws, t):
        # accumulate sum_k w_k * (2^(24k) mod q) mod q per prime row
        pk = np.array(
            [
                [pow(1 << (24 * kk), 1, ctx.basis.primes[r]) for kk in range(nwords)]
                for r in rws
            ],
            np.uint32,
        )  # [L, nwords]
        acc = jnp.zeros((len(rws), B, n), jnp.uint32)
        qq = t["q"][:, :, None]
        mu = t["mu"][:, :, None]
        for kk in range(nwords):
            wm = jnp.where(w[kk] < 0, w[kk] + qq.astype(jnp.int32), w[kk]).astype(
                jnp.uint32
            )
            acc = add_mod(
                acc, mul_mod_barrett(wm, pk[:, kk][:, None, None], qq, mu), qq
            )
        return rns.ntt_b(acc, ctx.basis, rws)

    mask_l = jnp.swapaxes(fold(rows, t_l), 0, 1)  # [B, l, N]
    mask_f = jnp.swapaxes(fold(tgt_rows, t_f), 0, 1)
    ql = t_l["q"][None]
    qf = t_f["q"][None]
    sk_l = sk[jnp.asarray(rows)][None]
    sk_f = sk[jnp.asarray(tgt_rows)][None]
    h1 = add_mod(
        add_mod(mul_mod_barrett(c1s, sk_l, ql, t_l["mu"][None]), e1, ql),
        mask_l,
        ql,
    )
    h2 = sub_mod(
        add_mod(
            neg_mod(mul_mod_barrett(crp, sk_f, qf, t_f["mu"][None]), qf), e2, qf
        ),
        mask_f,
        qf,
    )
    return h1, h2


def collective_bootstrap_many(
    net: Network, cps: CryptoParams, cts, source_pid: int,
    target_nmod: Optional[int] = None,
):
    """Batched collective bootstrap: for each level group, ONE combined
    {h1, h2} aggregation round covers every ciphertext (vs 2 rounds PER ct in
    the per-goroutine reference structure, mpc/mhe.go:222-261).

    target_nmod selects the refresh target level (default: top).  Pipelines
    that live in the matmult band pass the band so the recode, masks and
    CRPs are sized to what will actually be used.

    Each party's share is ONE fused device kernel; over the zero-copy local
    transport the hub alone runs the exact CRT recode and broadcasts the
    finished c0 (identical at every party by construction -- mu is
    protocol-public), so the host-side lift happens once per round instead
    of once per party."""
    if net.pid == 0:
        return cts
    ctx = cps.ctx
    params = ctx.params
    if source_pid > 0:
        cts = broadcast_cvec(net, cps, cts, source_pid)
    rng = cps.enc_rng
    tgt = min(target_nmod or ctx.nq, ctx.nq)
    tgt = max(tgt, max(ct.nmod for ct in cts))
    # Scale reset (the reference's Recode(ct, params.Scale()) semantics,
    # mpc/mhe.go:327-329): refresh two primes ABOVE the requested level,
    # then retarget every ciphertext to exactly the preset scale with a
    # scale-targeted constant multiply + one fused pair-rescale.  This makes
    # bootstrap a hard scale-reset point, so same-level chains downstream
    # add with EXACTLY equal scales (the r3 phase-3 crash was per-column
    # pair-product drift accumulating at the modulus floor).  When the
    # requested level is already the top of the chain there is no headroom;
    # those call sites have levels to burn, so _align_scales' exact path
    # covers them instead.
    reset = tgt + 2 <= ctx.nq
    lift_tgt = tgt + 2 if reset else tgt
    tgt_rows = tuple(range(lift_tgt))
    t_f = _sel(ctx.basis, tgt_rows)
    out = [None] * len(cts)
    import math

    zero_copy = getattr(net.t, "zero_copy", False)
    for nmod, idxs in _nmod_groups(cts):
      with prof.span("bootstrap"):
        rows = tuple(range(nmod))
        t_l = _sel(ctx.basis, rows)
        B = len(idxs)
        c0s = jnp.stack([cts[i].c0 for i in idxs])
        c1s = jnp.stack([cts[i].c1 for i in idxs])

        # mask bound: 2^(bits(Q_l) - 2 - log2(nparty)); one flat sample
        # covers all B polys
        ql_bits = params.q_prod(nmod).bit_length()
        bound_bits = ql_bits - 3 - int(math.ceil(math.log2(max(2, net.nparty - 1))))
        nwords = (bound_bits + 23) // 24
        top_bits = bound_bits - 24 * (nwords - 1)

        # common reference polynomials for the re-encryption (target level),
        # derived on-device from the shared seed (identical at all parties)
        with net.rand.using(-1) as g:
            seed = int.from_bytes(g.bytes(8), "little")
        crp = C.device_uniform_b(
            ctx, tgt_rows, B,
            (np.uint32(seed & 0xFFFFFFFF), np.uint32(seed >> 32)),
            np.uint32(0),
        )

        with prof.span("bs_noise"):
            e1 = ctx.small_to_rns_b(
                np.stack([ctx.sample_gauss(rng) for _ in range(B)]), rows
            )
            e2 = ctx.small_to_rns_b(
                np.stack([ctx.sample_gauss(rng) for _ in range(B)]), tgt_rows
            )
        with prof.span("bs_share"):
            mseed = (
                np.uint32(rng.integers(0, 1 << 32, dtype=np.uint64)),
                np.uint32(rng.integers(0, 1 << 32, dtype=np.uint64)),
            )
            h1, h2 = _bs_share_kernel(
                ctx, rows, tgt_rows, B, nwords, top_bits,
                mseed, np.uint32(0), crp, c1s, cps.sk.s, e1, e2,
            )

        # h1 + h2 share one aggregation round
        def add_fn(a, b):
            return {
                "h1": add_mod(jnp.asarray(a["h1"]), jnp.asarray(b["h1"]), t_l["q"]),
                "h2": add_mod(jnp.asarray(a["h2"]), jnp.asarray(b["h2"]), t_f["q"]),
            }

        with prof.span("bs_agg"):
            agg = net.hub_gather_sum({"h1": h1, "h2": h2}, add_fn)

        def finalize(a):
            # masked decryption, exact recode to the target modulus.  The
            # masked value is bounded by the mask bound (2^bound_bits + the
            # plaintext, << Q_l/4), so the device-side float-assisted basis
            # extension is exact — no host big-int lift, and no device->host
            # readback (2.5 MB/s through the axon tunnel; this was 26 s per
            # PCA iteration in the round-5 cholQR profile)
            hh1, hh2 = jnp.asarray(a["h1"]), jnp.asarray(a["h2"])
            mu = add_mod(c0s, hh1, t_l["q"])
            mu_coeff = rns.ntt_b(jnp.swapaxes(mu, 0, 1), ctx.basis, rows, True)
            with prof.span("bs_crt_lift"):
                lifted = rns.crt_lift_centered_dev(
                    mu_coeff.reshape(nmod, B * ctx.n),
                    ctx.basis,
                    tuple(range(nmod)),
                    tuple(range(lift_tgt)),
                ).reshape(lift_tgt, B, ctx.n)
            mu_full = jnp.swapaxes(
                rns.ntt_b(lifted, ctx.basis, tgt_rows), 0, 1
            )
            return add_mod(mu_full, hh2, t_f["q"])

        if zero_copy:
            # hub finalizes once; the shared device buffer reaches everyone
            c0 = net.hub_broadcast(
                finalize(agg) if net.pid == net.hub_pid else None
            )
            c0 = jnp.asarray(c0)
        else:
            # TCP: broadcast the aggregated shares; every party finalizes
            # locally (identical results, no big extra transfers)
            agg = net.hub_broadcast(agg if net.pid == net.hub_pid else None)
            c0 = finalize(agg)

        if reset:
            # exact recode: per-ct constant c_b = round(Delta*pair/s_b)
            # folds the drifted input scale into the pair the rescale
            # divides out; output scale is the preset Delta EXACTLY
            # (relative value error ~2^-50 from the constant rounding)
            pair = float(params.q_primes[lift_tgt - 1]) * float(
                params.q_primes[lift_tgt - 2]
            )
            consts = np.empty((B, lift_tgt, 1), np.uint32)
            for b, i in enumerate(idxs):
                # drift-sized inputs only: a scale far off the preset here
                # is a level-accounting bug upstream, not drift
                assert 0.25 < params.scale / cts[i].scale < 4.0, (
                    params.scale,
                    cts[i].scale,
                )
                cval = int(round(params.scale * pair / cts[i].scale))
                for r in range(lift_tgt):
                    consts[b, r, 0] = cval % params.q_primes[r]
            cj = jnp.asarray(consts)
            qf = t_f["q"][None]
            muf = t_f["mu"][None]
            c0m = mul_mod_barrett(c0, cj, qf, muf)
            c1m = mul_mod_barrett(crp, cj, qf, muf)
            res = ctx.rescale2_many(
                jnp.concatenate([c0m, c1m]), lift_tgt - 1
            )
            for b, i in enumerate(idxs):
                out[i] = C.Ciphertext(res[b], res[B + b], tgt, params.scale)
        else:
            for b, i in enumerate(idxs):
                out[i] = C.Ciphertext(c0[b], crp[b], tgt, cts[i].scale)
    return out


def bootstrap_vec(net, cps, cv, source_pid, target_nmod=None):
    if net.pid == 0:
        return cv
    return collective_bootstrap_many(net, cps, cv, source_pid, target_nmod)


def bootstrap_mat(net, cps, cm, source_pid, target_nmod=None):
    if net.pid == 0:
        return cm
    flat = [ct for row in cm for ct in row]
    ref = collective_bootstrap_many(net, cps, flat, source_pid, target_nmod)
    out, ofs = [], 0
    for row in cm:
        out.append(ref[ofs : ofs + len(row)])
        ofs += len(row)
    return out


def bootstrap_mat_all(net, cps, cm, target_nmod=None):
    """Every data party's matrix refreshed in ONE combined round
    (mpc/mhe.go:351-365 loops the sources sequentially; here each source
    broadcasts its ciphertexts, then a single collective_bootstrap_many
    covers the union -- one aggregation round instead of one per party).
    Sources announce their per-row ct counts first so unbalanced row
    partitions stay in lockstep."""
    if net.pid == 0:
        return cm
    shapes = {}
    my_shape = [len(row) for row in cm] if net.pid > 0 else []
    for source in range(1, net.nparty):
        if net.pid == source:
            for p in range(1, net.nparty):
                if p != source:
                    net.send(my_shape, p)
            shapes[source] = my_shape
        else:
            shapes[source] = net.recv(source)
    # source-major flat list; each source broadcasts its block
    flat = []
    for source in range(1, net.nparty):
        total = sum(shapes[source])
        blk = [ct for row in cm for ct in row] if net.pid == source else [None] * total
        flat.extend(broadcast_cvec(net, cps, blk, source))
    ref = collective_bootstrap_many(net, cps, flat, -1, target_nmod)
    # take back this party's slice
    ofs = 0
    for source in range(1, net.nparty):
        if source == net.pid:
            break
        ofs += sum(shapes[source])
    out, pos = [], ofs
    for row in cm:
        out.append(ref[pos : pos + len(row)])
        pos += len(row)
    return out


# ---------------------------------------------------------------------------
# ciphertext transport helpers (mpc/sendrecieve.go, mpc/aggregate.go)


def ct_to_wire(ct: C.Ciphertext):
    # components stay device-resident: the local transport passes them
    # zero-copy; only the TCP codec serializes (pulling there is inherent)
    return {
        "c0": ct.c0,
        "c1": ct.c1,
        "nmod": ct.nmod,
        "scale": float(ct.scale),
    }


def ct_from_wire(d) -> C.Ciphertext:
    return C.Ciphertext(
        jnp.asarray(d["c0"]), jnp.asarray(d["c1"]), int(d["nmod"]), float(d["scale"])
    )


def send_ciphertext(net: Network, ct: C.Ciphertext, to: int):
    net.send(ct_to_wire(ct), to)


def recv_ciphertext(net: Network, frm: int) -> C.Ciphertext:
    return ct_from_wire(net.recv(frm))


def broadcast_ciphertext(net: Network, cps, ct, source_pid: int) -> C.Ciphertext:
    if net.pid == source_pid:
        for p in range(1, net.nparty):
            if p != source_pid:
                net.send(ct_to_wire(ct), p)
        return ct
    if net.pid > 0:
        return ct_from_wire(net.recv(source_pid))
    return ct


def broadcast_cvec(net: Network, cps, cts, source_pid: int):
    """Broadcast a whole ciphertext list in ONE message (the receivers may
    pass cts=None / a placeholder list; the wire carries the real ones)."""
    if net.pid == source_pid:
        wire = [ct_to_wire(ct) for ct in cts]
        for p in range(1, net.nparty):
            if p != source_pid:
                net.send(wire, p)
        return cts
    if net.pid > 0:
        return [ct_from_wire(d) for d in net.recv(source_pid)]
    return cts


def aggregate_ct(net: Network, cps: CryptoParams, ct: C.Ciphertext) -> C.Ciphertext:
    """Sum ciphertexts across data parties (AggregateCText,
    mpc/aggregate.go)."""
    if net.pid == 0:
        return ct
    return aggregate_cvec(net, cps, [ct])[0]


def aggregate_cvec(net, cps, cv):
    """Sum ciphertext vectors across data parties: per level group, ONE
    aggregation message carries the whole [B, 2, nmod, N] stack.  Per-position
    levels may differ across parties (a party may hold a deeper ct); the
    add_fn aligns each pair to the min level, exactly like the reference's
    per-ct aggregate."""
    if net.pid == 0:
        return cv
    ctx = cps.ctx

    def add_fn(a, b):
        out = []
        for da, db in zip(a, b):
            ca, cb = ct_from_wire(da), ct_from_wire(db)
            out.append(ct_to_wire(ctx.add(ca, cb)))
        return out

    out = net.aggregate([ct_to_wire(ct) for ct in cv], add_fn)
    return [ct_from_wire(d) for d in out]


def aggregate_cmat(net, cps, cm):
    if net.pid == 0:
        return cm
    flat = [ct for row in cm for ct in row]
    if not flat:
        return cm
    agg = aggregate_cvec(net, cps, flat)
    out, ofs = [], 0
    for row in cm:
        out.append(agg[ofs : ofs + len(row)])
        ofs += len(row)
    return out


def aggregate_int_vec(net: Network, vec: np.ndarray) -> np.ndarray:
    if net.pid == 0:
        return vec
    out = net.aggregate(np.asarray(vec), lambda a, b: np.asarray(a) + np.asarray(b))
    return np.asarray(out)
