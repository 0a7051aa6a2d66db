"""System and State pytrees — the static/dynamic split of the engine.

The reference splits its data between the host OpenMM ``System``/``Context``
and per-kernel CudaArrays uploaded at init (CudaVVKernels.cpp:602-636).  Here
everything static lives in one ``System`` pytree of device arrays and
everything that evolves in a ``State`` pytree, so a whole MD step is a pure
function ``state' = step(system, state)`` that XLA fuses into one program.

All arrays are padded to static shapes (index -1 = padding) so the step can be
jitted once and scanned.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

f32 = jnp.float32
i32 = jnp.int32


@struct.dataclass
class System:
    """Static description of the simulated system (the analog of OpenMM's
    ``System`` plus the index tables each reference kernel uploads at init).

    Index tables padded with -1; energy/force kernels mask on ``>= 0``.
    """

    # ---- per-particle ----
    masses: jnp.ndarray          # (N,) f32, 0 for virtual sites
    inv_masses: jnp.ndarray      # (N,) f32, 0 where massless
    charges: jnp.ndarray         # (N,) f32  (PME charges)
    lj_type: jnp.ndarray         # (N,) i32  index into acoef/bcoef
    # OPLS tabulated geometric-rule LJ (reference oplspsffile.py:1303-1326):
    #   E = (a/r^6)^2 - b/r^6,  a = acoef[t1,t2], b = bcoef[t1,t2]
    acoef: jnp.ndarray           # (T,T) f32
    bcoef: jnp.ndarray           # (T,T) f32
    # CustomNonbondedForce interaction groups (run-edl.py:57-64 uses them to
    # remove image<->electrode and image<->image LJ): pair (i,j) interacts via
    # LJ iff lj_group_allowed[lj_group[i], lj_group[j]].
    lj_group: jnp.ndarray        # (N,) i32 (all zeros when unused)
    lj_group_allowed: jnp.ndarray  # (G,G) bool

    # ---- bonded terms (CHARMM conventions, converted to kJ/mol, nm, rad) ----
    bonds: jnp.ndarray           # (NB,2) i32
    bond_r0: jnp.ndarray         # (NB,)
    bond_k: jnp.ndarray          # (NB,)  E = 0.5*k*(r-r0)^2 (k = 2*K_charmm)
    angles: jnp.ndarray          # (NA,3) i32
    angle_theta0: jnp.ndarray    # (NA,)
    angle_k: jnp.ndarray         # (NA,)  E = 0.5*k*(th-th0)^2
    ub_bonds: jnp.ndarray        # (NU,2) i32 (Urey-Bradley 1-3 springs)
    ub_r0: jnp.ndarray           # (NU,)
    ub_k: jnp.ndarray            # (NU,)
    dihedrals: jnp.ndarray       # (ND,4) i32
    dihedral_n: jnp.ndarray      # (ND,) f32 multiplicity
    dihedral_phase: jnp.ndarray  # (ND,) rad
    dihedral_k: jnp.ndarray      # (ND,)  E = k*(1+cos(n*phi - phase))
    # OPLS improper: E = k*(1-cos(2*theta)) over reordered atoms
    # (a2, a3, a1, a4) — reference oplspsffile.py:1125-1133.
    impropers: jnp.ndarray       # (NI,4) i32
    improper_k: jnp.ndarray      # (NI,)

    # ---- nonbonded bookkeeping ----
    # All pairs excluded from the standard direct-space interaction
    # (1-2, 1-3, 1-4, Drude/lone-pair expansions; oplspsffile.py:1437-1476),
    # stored per atom (both directions) so the reciprocal-space correction
    # -q_i q_j erf(beta r)/r is a gather-only sum.
    exclusions: jnp.ndarray      # (N,E) i32 padded -1
    # 1-4 exceptions as per-atom tables (both directions), gather-only
    # (oplspsffile.py:1415-1427).
    exc_idx: jnp.ndarray         # (N,XA) i32
    exc_qq: jnp.ndarray          # (N,XA) C*q1*q4/2 (includes ONE_4PI_EPS0)
    exc_c6: jnp.ndarray          # (N,XA) 4*eps*sigma^6
    exc_c12: jnp.ndarray         # (N,XA) 4*eps*sigma^12
    # LJ long-range dispersion-correction coefficients:
    # A2 = sum_{ti,tj} N_i N_j a_ij^2 ; B = sum N_i N_j b_ij
    disp_coef_a2: jnp.ndarray    # ()
    disp_coef_b: jnp.ndarray     # ()

    # ---- constraints / virtual sites ----
    constraints: jnp.ndarray     # (C,2) i32
    constraint_dist: jnp.ndarray # (C,)
    # LocalCoordinatesSite lone pairs (oplspsffile.py:964-992): site placed in
    # the frame of three parents.
    vsite_index: jnp.ndarray     # (V,) i32 site particle
    vsite_parents: jnp.ndarray   # (V,3) i32 (p1,p2,p3)
    vsite_origin_w: jnp.ndarray  # (V,3) origin weights
    vsite_x_w: jnp.ndarray       # (V,3) x-direction weights
    vsite_y_w: jnp.ndarray       # (V,3) y-direction weights
    vsite_local: jnp.ndarray     # (V,3) local position

    # ---- Drude force (oplspsffile.py:1478-1517) ----
    drude_pairs: jnp.ndarray     # (D,2) i32 (drude, parent)
    drude_k3: jnp.ndarray        # (D,) isotropic spring component
    drude_k1: jnp.ndarray        # (D,) extra along p1->p2 axis
    drude_k2: jnp.ndarray        # (D,) extra along p3->p4 axis
    drude_aniso: jnp.ndarray     # (D,4) i32 (p1,p2,p3,p4), -1 if isotropic
    # Thole screened dipole pairs: 4 site-pair interactions each.
    thole_sites: jnp.ndarray     # (TP,4) i32 (drude1, parent1, drude2, parent2)
    thole_qq: jnp.ndarray        # (TP,)  q_d1*q_d2
    thole_screen: jnp.ndarray    # (TP,)  (t1+t2)/(alpha1*alpha2)^(1/6), 1/nm

    # ---- NBTHOLE screened dipoles (oplspsffile.py:1350-1405) ----
    # per-atom NBTHOLE type (0 = inactive), alpha^(-1/6) factors (Angstrom
    # units, matching the reference's 10x nm conversion inside the screen),
    # and the (T+1,T+1) coefficient table; pairs of atoms in different
    # nonzero-coef type groups interact via
    # E = -C q1 q2 (1 + s r/2) exp(-s r)/r, s = coef * a1 * a2 * 10.
    nbt_idx: jnp.ndarray         # (N,) i32
    nbt_alpha: jnp.ndarray       # (N,) f32
    nbt_coef: jnp.ndarray        # (T+1,T+1) f32

    # ---- CLPol Tang-Toennies damping (force.py:230-282) ----
    tt_donors: jnp.ndarray       # (ND2,) i32 H-bond donor particles
    tt_charges: jnp.ndarray      # (N,) effective charges (parents carry -q_drude)
    tt_dipole_mask: jnp.ndarray  # (N,) bool — parent or drude of any dipole
    tt_b: jnp.ndarray            # () damping parameter b (1/nm)
    tt_cutoff: jnp.ndarray       # () cutoff (nm)

    # ---- molecules (VVIntegrator.cpp:123-135) ----
    particle_mol_id: jnp.ndarray # (N,) i32
    mol_masses: jnp.ndarray      # (M,)
    mol_inv_masses: jnp.ndarray  # (M,)
    # dense member table (M, Mmax) padded -1: COM reductions become a small
    # constant-index gather + dense sum instead of a segment_sum scatter
    mol_table: jnp.ndarray       # (M, Mmax) i32

    # ---- CMAP torsion cross-terms (oplspsffile.py:430-465, 1134-1169) ----
    # two dihedrals per term (atoms [:4] = phi, [4:] = psi); maps stored as
    # per-cell bicubic monomial coefficients (ops/cmap.py)
    cmap_atoms: jnp.ndarray      # (TC,8) i32
    cmap_map: jnp.ndarray        # (TC,) i32 map index per term
    cmap_coeffs: jnp.ndarray     # (M,Rmax,Rmax,4,4) f32
    cmap_res: jnp.ndarray        # (M,) i32 true grid resolution per map

    # ---- implicit solvent (ops/gb.py; oplspsffile.py:1532-1590) ----
    # None, or a gb.GBData pytree (per-atom radii + model config)
    gb: Optional[object] = None

    # ---- nonbonded method parameters ----
    r_cutoff: float = struct.field(pytree_node=False, default=1.2)
    # LJ switching distance (0 = off); OpenMM S(r) on [r_switch, r_cutoff]
    r_switch: float = struct.field(pytree_node=False, default=0.0)
    ewald_beta: float = struct.field(pytree_node=False, default=0.0)  # 0 => plain cutoff
    kmax: tuple = struct.field(pytree_node=False, default=(0, 0, 0))
    use_dispersion_correction: bool = struct.field(pytree_node=False, default=True)
    has_cm_motion_remover: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_atoms(self) -> int:
        return self.masses.shape[0]

    @property
    def n_molecules(self) -> int:
        return self.mol_masses.shape[0]

    @property
    def is_drude(self) -> bool:
        return self.drude_pairs.shape[0] > 0


@struct.dataclass
class State:
    """Everything that evolves during the simulation.

    Positions use compensated (two-float) storage mirroring the reference's
    mixed-precision posq+posqCorrection split (middle.cu:80-97): ``pos`` is the
    fp32 value, ``pos_err`` the accumulated rounding error, so long runs do not
    drift the way naive fp32 accumulation would.
    """

    pos: jnp.ndarray             # (N,3) f32
    pos_err: jnp.ndarray         # (N,3) f32 compensation term
    vel: jnp.ndarray             # (N,3) f32
    box: jnp.ndarray             # (3,) f32 orthorhombic box lengths
    # Nose-Hoover chain state per temperature group (TG_ATOM/TG_COM/TG_DRUDE).
    # The reference keeps these host-side (CudaVVKernels.h:203-209); we keep
    # them on device so the whole step stays fused.
    nh_eta: jnp.ndarray          # (G,C) f32
    nh_eta_dot: jnp.ndarray      # (G,C+1) f32
    nh_eta_dotdot: jnp.ndarray   # (G,C) f32
    rng_key: jnp.ndarray         # (2,) u32 threefry key for Langevin noise
    step: jnp.ndarray            # () i32
    time: jnp.ndarray            # () f32 ps
    cos_v: jnp.ndarray           # () f32 last cosine-velocity amplitude V

    @property
    def positions(self) -> jnp.ndarray:
        """Full-precision positions (pos + accumulated correction)."""
        return self.pos + self.pos_err


def make_state(positions, box, velocities=None, n_temp_groups: int = 3,
               num_nh_chains: int = 3, seed: int = 0) -> State:
    """Create a fresh State (velocities default to zero)."""
    pos = jnp.asarray(positions, f32)
    n = pos.shape[0]
    vel = (jnp.zeros((n, 3), f32) if velocities is None
           else jnp.asarray(velocities, f32))
    return State(
        pos=pos,
        pos_err=jnp.zeros_like(pos),
        vel=vel,
        box=jnp.asarray(box, f32),
        nh_eta=jnp.zeros((n_temp_groups, num_nh_chains), f32),
        nh_eta_dot=jnp.zeros((n_temp_groups, num_nh_chains + 1), f32),
        nh_eta_dotdot=jnp.zeros((n_temp_groups, num_nh_chains), f32),
        rng_key=jax.random.PRNGKey(seed),
        step=jnp.zeros((), i32),
        time=jnp.zeros((), f32),
        cos_v=jnp.zeros((), f32),
    )


def pad_system(system: System, n_pad: int) -> System:
    """Append ``n_pad - n_atoms`` ghost particles: massless, chargeless,
    zero-LJ, excluded from every term table — physically inert (the same
    species as the EDL image particles minus the mirror sync).

    Multi-chip sharding requires the atom axis to be divisible by the mesh
    size (NamedSharding rejects uneven dims); Context(mesh=...) pads the
    system up to the next multiple and hides the ghosts from the public
    position/velocity surface.
    """
    import numpy as np
    n = system.n_atoms
    extra = int(n_pad) - n
    if extra <= 0:
        return system
    if system.gb is not None:
        raise NotImplementedError(
            "mesh padding of implicit-solvent (GB) systems is not supported"
            " — GB is a non-periodic model (oplspsffile.py:1585-1586)")
    d = {f.name: getattr(system, f.name)
         for f in system.__dataclass_fields__.values()}

    def app(name, fill, dtype=None):
        a = np.asarray(d[name])
        pad = np.full((extra,) + a.shape[1:], fill,
                      dtype if dtype is not None else a.dtype)
        d[name] = np.concatenate([a, pad], axis=0)

    # ghosts use a dedicated zero-LJ type (a = b = 0 row/col)
    T = np.asarray(d["acoef"]).shape[0]
    for name in ("acoef", "bcoef"):
        a = np.asarray(d[name])
        a = np.pad(a, ((0, 1), (0, 1)))
        d[name] = a.astype(np.float32)
    app("lj_type", T)
    for name in ("masses", "inv_masses", "charges", "nbt_alpha",
                 "tt_charges"):
        app(name, 0.0)
    app("lj_group", 0)
    app("nbt_idx", 0)
    app("tt_dipole_mask", False)
    app("exclusions", -1)
    app("exc_idx", -1)
    for name in ("exc_qq", "exc_c6", "exc_c12"):
        app(name, 0.0)
    # each ghost is its own massless molecule (no COM DOF, empty member
    # row in the dense COM tables — the image-particle precedent)
    m = np.asarray(d["mol_masses"]).shape[0]
    d["particle_mol_id"] = np.concatenate(
        [np.asarray(d["particle_mol_id"]),
         m + np.arange(extra, dtype=np.int32)])
    for name in ("mol_masses", "mol_inv_masses"):
        a = np.asarray(d[name])
        d[name] = np.concatenate([a, np.zeros(extra, a.dtype)])
    mt = np.asarray(d["mol_table"])
    d["mol_table"] = np.concatenate(
        [mt, np.full((extra, mt.shape[1]), -1, mt.dtype)], axis=0)
    return System(**d)


def set_velocities_to_temperature(system: System, state: State, temperature: float,
                                  seed: int = 12345) -> State:
    """Draw Maxwell-Boltzmann velocities (massless particles get zero).

    Mirrors OpenMM Context.setVelocitiesToTemperature as used by
    run-bulk.py:86.
    """
    from .units import BOLTZ
    key = jax.random.PRNGKey(seed)
    n = system.n_atoms
    sigma = jnp.sqrt(BOLTZ * temperature * system.inv_masses)[:, None]
    vel = sigma * jax.random.normal(key, (n, 3), f32)
    return state.replace(vel=vel)
