"""Explicit Runge--Kutta Butcher tableaus.

Native replacement for the diffrax solver objects the reference instantiates
via ``getattr(diffrax, cfg.method)()`` (reference: src/models/
graph_neural_cde.py:53, model method Literals "Tsit5"/"Dopri5"/"Kvaerno*").

Coefficients:
  * Tsit5: Tsitouras (2011), the same 7-stage FSAL 5(4) pair diffrax uses.
  * Dopri5: Dormand--Prince 5(4), 7-stage FSAL.
  * Bosh3: Bogacki--Shampine 3(2), 4-stage FSAL.
  * Euler/Heun: fixed-order basics for constant-step paths.

``b_err`` rows give the *error-estimate* weights (b - b_hat), so the embedded
error is ``h * sum_i b_err[i] * k[i]``.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import numpy as np


@dataclasses.dataclass(frozen=True)
class ButcherTableau:
    name: str
    c: tuple
    a: tuple  # lower-triangular rows: a[i] has i entries (stage i uses k_0..k_{i-1})
    b: tuple
    b_err: tuple  # error-estimate weights (b - b_hat); empty => no embedded error
    order: int  # order of the propagating solution
    error_order: int  # order of the embedded estimate + 1 (controller exponent)
    fsal: bool
    implicit: bool = False  # ESDIRK: stages i>=1 have diagonal entry a_diag
    a_diag: float = 0.0  # the DIRK gamma
    picard_iters: int = 4  # fixed-point iterations per implicit stage
    # "newton": matrix-free Newton-Krylov stage solve (solve._rk_step) --
    # handles genuinely stiff regimes where Picard diverges (requires
    # h * gamma * ||J|| < 1). "picard": fixed-point iteration, cheaper.
    stage_solver: str = "newton"
    newton_iters: int = 2  # Newton iterations per implicit stage
    krylov_iters: int = 8  # GMRES iterations per Newton iteration

    @property
    def num_stages(self) -> int:
        return len(self.c)


TSIT5 = ButcherTableau(
    name="tsit5",
    c=(0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0),
    a=(
        (),
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (
            5.325864828439257,
            -11.748883564062828,
            7.4955393428898365,
            -0.09249506636175525,
        ),
        (
            5.86145544294642,
            -12.92096931784711,
            8.159367898576159,
            -0.071584973281401,
            -0.028269050394068383,
        ),
        (
            0.09646076681806523,
            0.01,
            0.4798896504144996,
            1.379008574103742,
            -3.290069515436081,
            2.324710524099774,
        ),
    ),
    b=(
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    ),
    b_err=(
        -0.00178001105222577714,
        -0.0008164344596567469,
        0.007880878010261995,
        -0.1447110071732629,
        0.5823571654525552,
        -0.45808210592918697,
        0.015151515151515152,
    ),
    order=5,
    error_order=5,
    fsal=True,
)

DOPRI5 = ButcherTableau(
    name="dopri5",
    c=(0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    a=(
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    b=(35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    b_err=(
        35 / 384 - 5179 / 57600,
        0.0,
        500 / 1113 - 7571 / 16695,
        125 / 192 - 393 / 640,
        -2187 / 6784 + 92097 / 339200,
        11 / 84 - 187 / 2100,
        -1 / 40,
    ),
    order=5,
    error_order=5,
    fsal=True,
)

BOSH3 = ButcherTableau(
    name="bosh3",
    c=(0.0, 1 / 2, 3 / 4, 1.0),
    a=((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    b=(2 / 9, 1 / 3, 4 / 9, 0.0),
    b_err=(2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8),
    order=3,
    error_order=3,
    fsal=True,
)

EULER = ButcherTableau(
    name="euler",
    c=(0.0,),
    a=((),),
    b=(1.0,),
    b_err=(),
    order=1,
    error_order=2,
    fsal=False,
)

HEUN = ButcherTableau(
    name="heun",
    c=(0.0, 1.0),
    a=((), (1.0,)),
    b=(1 / 2, 1 / 2),
    b_err=(-1 / 2, 1 / 2),
    order=2,
    error_order=2,
    fsal=False,
)



# Kvaerno (1999) ESDIRK 3(2): 4 stages, stiffly accurate, gamma=0.435866521508459.
# Implicit stages solved by fixed-count Picard iteration (see solve._esdirk
# for the stiffness caveat).
KVAERNO3 = ButcherTableau(
    name="kvaerno3",
    c=(0.0, 0.871733043016918, 1.0, 1.0),
    a=(
        (),
        (0.435866521508459,),
        (0.490563388419108, 0.073570090080892),
        (0.308809969973036, 1.490563388254106, -1.235239879727145),
    ),
    b=(0.308809969973036, 1.490563388254106, -1.235239879727145, 0.435866521508459),
    b_err=(-0.181753418446072, 1.416993298173214, -1.671106401235604, 0.435866521508459),
    order=3,
    error_order=3,
    fsal=True,
    implicit=True,
    a_diag=0.435866521508459,
)

# Kvaerno3 with the cheap fixed-point stage solver (mildly stiff regimes).
KVAERNO3_PICARD = dataclasses.replace(KVAERNO3, stage_solver="picard")

# Kennedy & Carpenter (2003) ARK4(3)6L[2]SA, implicit (ESDIRK) part:
# 6 stages, explicit first stage, gamma=1/4, stiffly accurate, L-stable,
# order 4 with an order-3 embedded estimate. All coefficients are exact
# rationals; tests/test_solve.py verifies every order condition through
# order 4 plus L-stability, so a transcription error cannot pass silently.
KENCARP4 = ButcherTableau(
    name="kencarp4",
    c=(0.0, 1 / 2, 83 / 250, 31 / 50, 17 / 20, 1.0),
    a=(
        (),
        (1 / 4,),
        (8611 / 62500, -1743 / 31250),
        (5012029 / 34652500, -654441 / 2922500, 174375 / 388108),
        (
            15267082809 / 155376265600,
            -71443401 / 120774400,
            730878875 / 902184768,
            2285395 / 8070912,
        ),
        (82889 / 524892, 0.0, 15625 / 83664, 69875 / 102672, -2260 / 8211),
    ),
    b=(82889 / 524892, 0.0, 15625 / 83664, 69875 / 102672, -2260 / 8211, 1 / 4),
    b_err=(
        82889 / 524892 - 4586570599 / 29645900160,
        0.0,
        15625 / 83664 - 178811875 / 945068544,
        69875 / 102672 - 814220225 / 1159782912,
        -2260 / 8211 + 3700637 / 11593932,
        1 / 4 - 61727 / 225920,
    ),
    order=4,
    error_order=4,
    fsal=True,
    implicit=True,
    a_diag=1 / 4,
)


# Genuine order-4 and order-5 ESDIRK tableaus in the Kvaerno (2004) design
# class, DERIVED FROM SCRATCH by tools/derive_esdirk.py (not transcribed):
# explicit first stage, stage order 2, stiffly accurate, L-stable, with the
# penultimate stage doubling as the embedded lower-order solution
# (b_hat = A[s-2]).  gamma for the 4(3) is the L-stability root of
# g^4 - 4g^3 + 3g^2 - (2/3)g + 1/24 (the z^4 coefficient of (1-gz)^4 e^z);
# given gamma the whole 4(3) tableau reduces to the unique root
# c3 = 0.59710... of the last order-4 condition b.Ac^2 = 1/12 -- every other
# entry is a linear solve.  The 5(4) uses the classical gamma = 0.26 with
# (c3, c4) chosen by an error-constant sweep and R(inf) = -(A22^{-1} a1)_s
# zeroed exactly.  All coefficients were polished with mpmath at 50 digits;
# tests/test_solve.py re-verifies every order condition through design
# order, embedded order, A- and L-stability, so a transcription error here
# cannot pass silently.  Serves the reference's Kvaerno4/Kvaerno5 method
# names (reference: src/models/graph_neural_cde.py:53).
KVAERNO4 = ButcherTableau(
    name="kvaerno4",
    c=(0.0, 1.1456321249642698, 0.5971049876523115, 1.0, 1.0),
    a=(
        (),
        (0.5728160624821349,),
        (0.16723546202721076, -0.14294653685703412),
        (0.2626032902526958, -0.3119043274205632, 0.4764849746857325),
        (0.197216548312835, 0.17684378390637218, 0.8154421813508385, -0.7623185760521805),
    ),
    b=(0.197216548312835, 0.17684378390637218, 0.8154421813508385, -0.7623185760521805, 0.5728160624821349),
    b_err=(
        -0.0653867419398608,
        0.48874811132693535,
        0.338957206665106,
        -1.3351346385343152,
        0.5728160624821349,
    ),
    order=4,
    error_order=4,
    fsal=True,
    implicit=True,
    a_diag=0.5728160624821349,
)

KVAERNO5 = ButcherTableau(
    name="kvaerno5",
    c=(0.0, 0.52, 0.85, 0.41000000000000003, 0.9616978618695052, 1.0, 1.0),
    a=(
        (),
        (0.26,),
        (0.3202884615384615, 0.26971153846153845),
        (0.17877874734663185, -0.0057937431655668515, -0.02298500418106498),
        (0.09228493069653343, 0.36755441946224615, -0.17704623464919977, 0.4189047463599254),
        (
            0.21574750358511677,
            1.610914170036982,
            -0.592216133545259,
            -0.6909861178458204,
            0.19654057776898062,
        ),
        (
            0.1224820370381446,
            -0.21145565388043613,
            0.1845619848152068,
            0.7315814663815129,
            0.5143136884415144,
            -0.6014835227959426,
        ),
    ),
    b=(
        0.1224820370381446,
        -0.21145565388043613,
        0.1845619848152068,
        0.7315814663815129,
        0.5143136884415144,
        -0.6014835227959426,
        0.26,
    ),
    b_err=(
        -0.09326546654697217,
        -1.8223698239174182,
        0.7767781183604658,
        1.4225675842273333,
        0.3177731106725338,
        -0.8614835227959426,
        0.26,
    ),
    order=5,
    error_order=5,
    fsal=True,
    implicit=True,
    a_diag=0.26,
)


def _build_dopri8() -> ButcherTableau:
    """Prince-Dormand 8(5,3) ("DOP853") from scipy's published coefficient
    arrays (scipy.integrate._ivp.dop853_coefficients) -- 12 propagating
    stages + the FSAL f(t1, y1) evaluation as stage 13, exactly the tableau
    diffrax's Dopri8 implements. The embedded error uses the order-5 weights
    (E5); DOP853's 5/3 error blend only changes step-size heuristics, not
    the order-8 solution."""
    from scipy.integrate._ivp import dop853_coefficients as dd

    s = dd.N_STAGES  # 12
    A = np.asarray(dd.A, dtype=np.float64)
    B = np.asarray(dd.B, dtype=np.float64)
    C = np.asarray(dd.C, dtype=np.float64)
    E5 = np.asarray(dd.E5, dtype=np.float64)
    a_rows = [tuple(A[i, :i]) for i in range(s)]
    a_rows.append(tuple(B))  # stage 13: k13 = f(t1, y1) (FSAL)
    return ButcherTableau(
        name="dopri8",
        c=tuple(C[:s]) + (1.0,),
        a=tuple(a_rows),
        b=tuple(B) + (0.0,),
        b_err=tuple(E5[: s + 1]),
        order=8,
        # The E5 estimator is order 5 (err ~ h^6): 1/6 is the consistent
        # I-controller exponent for it (scipy's -1/8 pairs with its blended
        # 5/3 error, which scales differently).
        error_order=6,
        fsal=True,
    )


try:  # scipy is baked into this image; keep a fallback for minimal envs.
    DOPRI8 = _build_dopri8()
except Exception:  # pragma: no cover
    DOPRI8 = dataclasses.replace(DOPRI5, name="dopri8(dopri5-fallback)")


_TABLEAUS: tp.Dict[str, ButcherTableau] = {
    "tsit5": TSIT5,
    "dopri5": DOPRI5,
    "bosh3": BOSH3,
    "euler": EULER,
    "heun": HEUN,
    # Reference method-name aliases (model_configs.py method Literals).
    "Tsit5": TSIT5,
    "Dopri5": DOPRI5,
    "Bosh3": BOSH3,
    "Euler": EULER,
    "Heun": HEUN,
    "kvaerno3": KVAERNO3,
    "Kvaerno3": KVAERNO3,
    "Kvaerno3Picard": KVAERNO3_PICARD,
    "kencarp4": KENCARP4,
    "KenCarp4": KENCARP4,
    "kvaerno4": KVAERNO4,
    "Kvaerno4": KVAERNO4,
    "kvaerno5": KVAERNO5,
    "Kvaerno5": KVAERNO5,
    "dopri8": DOPRI8,
    "Dopri8": DOPRI8,
}


def get_tableau(name: str) -> ButcherTableau:
    if isinstance(name, ButcherTableau):
        return name
    if name not in _TABLEAUS:
        raise ValueError(f"Unknown solver {name!r}; have {sorted(set(_TABLEAUS))}")
    return _TABLEAUS[name]
