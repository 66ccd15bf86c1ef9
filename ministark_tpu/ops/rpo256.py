"""Rescue Prime Optimized (RPO-256) over Goldilocks, batched on device.

Parity target: the reference's Metal kernels (gpu/src/metal/hash_shaders.h.metal
— STATE_WIDTH 12, CAPACITY 4, DIGEST 4, 7 rounds; eprint 2022/1577).  The
MDS/round constants below are the same public parameters; the reference
stores them in Montgomery form (R = 2^64 mod p), here they are canonical
(value = montgomery * R^-1 mod p, computed at import).

TPU design: the MDS layer exploits that the canonical MDS entries are tiny
(<= 26): states split into 16-bit limbs and the 12x12 matrix-vector product
becomes ONE integer einsum with results < 2^25 (no carries), then a single
Goldilocks reduction per element.  The 7 rounds run under fori_loop so the
compiled graph stays small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import device as fd
from ..fields.scalar import P, R_MONT_INV

STATE_WIDTH = 12
CAPACITY = 4
RATE = 8
DIGEST_SIZE = 4
NUM_ROUNDS = 7
INV_ALPHA = 10540996611094048183  # x^7 inverse exponent (mod p-1)

# Montgomery-form parameters as published in the RPO reference kernels
_MDS_MONT_FIRST_ROW = [
    30064771065, 98784247785, 34359738360, 111669149670, 55834574835,
    42949672950, 38654705655, 30064771065, 25769803770, 94489280490,
    90194313195, 34359738360,
]

_RC0_MONT = [
    [6936159699454947676, 6871277616928621393, 4226339945476756083, 2261225084505152444, 16808067423291017741, 12862191241011323277, 345720808813194915, 10126368034161173654, 840649715788759894, 18155600607269645987, 16577339120870559289, 13749826054300849029],
    [16047969944113931191, 10474334246235299199, 15773847146013662260, 14401231158322525155, 6009395255763488383, 2108579439821148946, 13820200715803196660, 15968614366574245570, 7529997729792773654, 9429194013557833999, 11639903126146281421, 15759666882357935738],
    [14807658266593669785, 17258259860767641342, 9534132615398591413, 358719342502509866, 7123090532818864651, 734193187930710962, 14873184913735487023, 17965359964069906568, 12664837478844326631, 15575491070113731145, 7221479899469196675, 7328957460733188967],
    [15088355010936495340, 16762963605345901631, 15278161326153175940, 6257793333052173411, 8418953127708045776, 6523475766574412380, 15192936988185261803, 1578086224854546096, 10840553425559156784, 7453417405109536362, 5173069484734008228, 3284492202065476384],
    [1724586709636399686, 17997633752581871175, 1284825320737914582, 960534381847281815, 6708901808183456837, 8975591106768797316, 52515315389099119, 10009391031874081397, 3091228317422201238, 1063858230459024983, 3396548655473917480, 15046057790353688034],
    [4867464583127666756, 13816959924674544309, 13931201815459591565, 11494116713280125381, 16823081743980874023, 6760771226809185048, 5346741505458044699, 15124596060558844029, 5332565678905773189, 17640389307200936126, 14049814539797608740, 8882709539093378074],
    [10507930462458090835, 10669463960502417047, 16753662827442720769, 12967456627495301601, 2989815121821278695, 5894674479204135685, 14187454698288462352, 14795723369628125345, 17260571099239679821, 16009836214833755168, 2009092225887788829, 10838446069154019765],
]

_RC1_MONT = [
    [8939123259393952351, 14708045228210488368, 18125168669810517809, 9309821433754818185, 4714467145607136006, 1302482025306688824, 34829973686821040, 5637233680011148778, 227119480134509573, 2530972937109017559, 7210163798538732239, 955913576003606833],
    [4449617297638325218, 10843671682695268638, 13198957499160452915, 11541825028620451829, 10963484480734735121, 4752902142121643229, 3015289210993491059, 16344286514680205966, 1811079964700766606, 12735664961476037524, 5775391330037813314, 18223625362487900986],
    [7222477607687412281, 4215615082079701144, 6177508277476483691, 3491362079220677263, 10961785333913978630, 1935408839283360916, 13974192629927279950, 18013556876298568088, 7565676920589638093, 9265825103386412558, 8061587790235022972, 6806849270604947860],
    [8066442548506952806, 12791828131640457742, 9268748809821748950, 17496234860625277598, 13583894547367420658, 13920282495726802458, 3933141341199584259, 6658057712176150702, 16812362035931029194, 15160401867587809089, 16411108749946146942, 3390826434320009844],
    [18405475140095477472, 13864039573264702148, 496144052468360460, 9791523668470936672, 528582340156917005, 15864481364569144493, 682830611952089590, 347158833826327515, 13752775429919623417, 10254722988306758482, 8794150602427420596, 2480344122229837853],
    [15462337562022968595, 6729968753311049611, 9250220857258211097, 12031447985684644003, 14538803180331344696, 4055445230671851890, 14764039661528567501, 2047787218814287270, 8977863094202715520, 6560450968915612407, 9976241128570886075, 17877509887772213755],
    [3549624494907837709, 4253629935471652443, 2859199883984623807, 1087607721547343649, 7907517619951970198, 11306402795121903516, 10168009948206732524, 9177440083248248246, 13169036816957726187, 12924186209140199217, 9673006056831483321, 747828276541750689],
]


def _from_mont(v: int) -> int:
    return v * R_MONT_INV % P


# canonical small-int circulant MDS (first row)
MDS_FIRST_ROW = [_from_mont(v) for v in _MDS_MONT_FIRST_ROW]
MDS = np.zeros((STATE_WIDTH, STATE_WIDTH), dtype=np.uint32)
for _m in range(STATE_WIDTH):
    for _n in range(STATE_WIDTH):
        MDS[_m, _n] = MDS_FIRST_ROW[(_n - _m) % STATE_WIDTH]
assert MDS.max() < 32

ROUND_CONSTANTS_0 = np.array([[_from_mont(v) for v in row] for row in _RC0_MONT],
                             dtype=np.uint64)
ROUND_CONSTANTS_1 = np.array([[_from_mont(v) for v in row] for row in _RC1_MONT],
                             dtype=np.uint64)


def _rc_pair(rc: np.ndarray):
    return (jnp.asarray((rc & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((rc >> 32).astype(np.uint32)))


def _mds_mul(state):
    """state: (batch, 12) limb pairs -> MDS @ state, same shape.

    16-bit limb split; integer einsum (results < 2^25); carry-propagate and
    reduce via the 2^64 = 2^32-1 identity."""
    lo, hi = state
    limbs = jnp.stack(
        [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16], axis=-1
    ).astype(jnp.uint32)  # (batch, 12, 4)
    mds = jnp.asarray(MDS)
    acc = jnp.einsum("mn,bnk->bmk", mds, limbs,
                     preferred_element_type=jnp.uint32)  # < 2^25 per entry
    t0 = acc[..., 0]
    t1 = acc[..., 1] + (t0 >> 16)
    t2 = acc[..., 2] + (t1 >> 16)
    t3 = acc[..., 3] + (t2 >> 16)
    t4 = t3 >> 16  # < 2^9: the 2^64 overflow limb
    out_lo = (t0 & 0xFFFF) | ((t1 & 0xFFFF) << 16)
    out_hi = (t2 & 0xFFFF) | ((t3 & 0xFFFF) << 16)
    return fd.reduce128(out_lo.astype(jnp.uint32), out_hi.astype(jnp.uint32),
                        t4.astype(jnp.uint32), jnp.zeros_like(t4, jnp.uint32))


def _pow7(x):
    x2 = fd.mul(x, x)
    x3 = fd.mul(x2, x)
    x6 = fd.mul(x3, x3)
    return fd.mul(x6, x)


@jax.jit
def permute(state):
    """RPO permutation on (batch, 12) limb pairs."""
    rc0 = _rc_pair(ROUND_CONSTANTS_0)
    rc1 = _rc_pair(ROUND_CONSTANTS_1)

    def round_body(i, st):
        st = _mds_mul(st)
        st = fd.add(st, (rc0[0][i], rc0[1][i]))
        st = _pow7(st)
        st = _mds_mul(st)
        st = fd.add(st, (rc1[0][i], rc1[1][i]))
        st = fd.pow_const(st, INV_ALPHA)
        return st

    return jax.lax.fori_loop(0, NUM_ROUNDS, round_body, state)


def _empty_state(batch: int, padded: bool):
    lo = jnp.zeros((batch, STATE_WIDTH), fd.U32)
    hi = jnp.zeros((batch, STATE_WIDTH), fd.U32)
    if padded:
        # spec: first capacity element set to 1 when input needs padding
        lo = lo.at[:, 0].set(1)
    return (lo, hi)


def absorb_chunk(state, chunk):
    """Overwrite the rate portion with a (batch, 8) chunk and permute."""
    lo, hi = state
    lo = lo.at[:, CAPACITY:].set(chunk[0])
    hi = hi.at[:, CAPACITY:].set(chunk[1])
    return permute((lo, hi))


def digest(state):
    """(batch, 4) digest limb pairs (state elements 4..8)."""
    return (state[0][:, CAPACITY:CAPACITY + DIGEST_SIZE],
            state[1][:, CAPACITY:CAPACITY + DIGEST_SIZE])


def hash_elements_batch(cols):
    """Hash rows of a matrix given as a list of ncols (n,) Fp limb pairs.

    Equivalent to the reference's column-major absorb (gpu/src/plan.rs:32-107):
    absorb 8 columns per permutation; pad with a single 1 element then zeros,
    setting the capacity flag, when ncols is not a multiple of 8."""
    ncols = len(cols)
    n = cols[0][0].shape[-1]
    padded = ncols % RATE != 0
    state = _empty_state(n, padded)
    chunks = [cols[i:i + RATE] for i in range(0, ncols, RATE)]
    for chunk in chunks:
        if len(chunk) < RATE:
            ones = (jnp.ones((n,), fd.U32), jnp.zeros((n,), fd.U32))
            zeros = (jnp.zeros((n,), fd.U32), jnp.zeros((n,), fd.U32))
            chunk = list(chunk) + [ones] + [zeros] * (RATE - len(chunk) - 1)
        clo = jnp.stack([c[0] for c in chunk], axis=-1)
        chi = jnp.stack([c[1] for c in chunk], axis=-1)
        state = absorb_chunk(state, (clo, chi))
    return digest(state)


def merge_digests(left, right):
    """Merkle node hash: two (batch, 4) digests absorbed in one permutation."""
    lo = jnp.concatenate([left[0], right[0]], axis=-1)
    hi = jnp.concatenate([left[1], right[1]], axis=-1)
    batch = lo.shape[0]
    state = _empty_state(batch, padded=False)
    return digest(absorb_chunk(state, (lo, hi)))
