"""Fq12 exponentiation AIR: output = offset * x^exp in the BN254 Fq12 tower.

Equivalent of reference `Fq12ExpStark` (src/fields/fq12/exp.rs): the same
512-row double-and-add machine as FqExpAir over 12-coefficient Fq12 values.

Row layout (fq12/exp.rs:1-34):
  [ a(12*16) | b(12*16) | Fq12Output(84*16) | flags(14) ]  = 1742 main cols
  + periodic(2) + io-pulses(1+4*num_io)
  + split-u16 range check over cols 24*N_LIMBS .. 108*N_LIMBS-12
    (outputs + aux; operands a/b are pinned by transition equality).
Public IO per instance (36*N_LIMBS + 8): x/offset/output as 12x16 u16 limbs,
exp_val as 8 u32 limbs.
"""

from __future__ import annotations

import numpy as np

from .. import bn254
from ..gadgets import flags as fl
from ..gadgets import fq12 as fq12g
from ..gadgets import pulse as pu
from ..gadgets import range_check as rc
from ..gadgets.equals import vec_equal, vec_equal_transition
from ..stark.air import Air
from ..stark.field_expr import Val
from ..utils.conversions import N_LIMBS, fq_to_u32_limbs, int_to_limbs
from .fq_exp import u16_to_u32_lanes  # noqa: F401 (API parity)

NUM_MAIN = 108 * N_LIMBS + fl.NUM_FLAGS_COLS  # 1742
START_FLAGS = 108 * N_LIMBS
START_RANGE_CHECK = 24 * N_LIMBS
NUM_RANGE_CHECK = 84 * N_LIMBS - 12  # 1332
RANGE_TARGETS = list(range(START_RANGE_CHECK, START_RANGE_CHECK + NUM_RANGE_CHECK))
FQ12_EXP_IO_LEN = 36 * N_LIMBS + fl.NUM_INPUT_LIMBS  # 584
ROWS_PER_BLOCK = fl.NUM_FLAG_ROWS


class Fq12ExpAir(Air):
    def __init__(
        self, num_io: int, range_check: str = "logup", io_binding: str = "auto"
    ):
        self.num_io = num_io
        assert range_check in ("split", "logup")
        self.range_check = range_check
        if io_binding == "auto":
            io_binding = "rlc" if num_io >= 128 else "pulse"
        assert io_binding in ("pulse", "rlc")
        self.io_binding = io_binding
        self.start_periodic = NUM_MAIN
        if io_binding == "pulse":
            self.start_io_pulses = NUM_MAIN + 2
            self.start_lookups = self.start_io_pulses + 1 + 4 * num_io
        else:
            self.start_final_periodic = NUM_MAIN + 2
            self.start_lookups = NUM_MAIN + 4
        self.rc_spec = rc.RangeCheckSpec(range_check, self.start_lookups, RANGE_TARGETS)
        self.num_columns = self.start_lookups + self.rc_spec.num_added
        self.num_public_inputs = FQ12_EXP_IO_LEN * num_io

    def aux_extra_width(self) -> int:
        return 2 if self.io_binding == "rlc" else 0

    def _rlc_binding(self):
        from ..stark.io_rlc import RlcIoBinding

        return RlcIoBinding(
            io_len=FQ12_EXP_IO_LEN,
            in_len=24 * N_LIMBS + fl.NUM_INPUT_LIMBS,
            rows_per_block=ROWS_PER_BLOCK,
            input_cells=self._rlc_input_cells,
            output_cells=self._rlc_output_cells,
            host_in_cells=self._host_in_cells,
            host_out_cells=self._host_out_cells,
        )

    def _rlc_input_cells(self, view):
        from ..stark.field_expr import lane_concat

        s = START_FLAGS
        ab = view.cols(0, 24 * N_LIMBS)  # x and offset limbs, PI order
        limbs = view.cols(s + 6, s + 6 + fl.NUM_INPUT_LIMBS)
        first = Val(
            limbs.arr[..., 0:1, :] if limbs.ext else limbs.arr[..., 0:1], limbs.ext
        )
        rest = Val(
            limbs.arr[..., 1:, :] if limbs.ext else limbs.arr[..., 1:], limbs.ext
        )
        restored0 = first * 2 + view.col(s + 4).lane()
        return lane_concat([ab, restored0, rest])

    def _rlc_output_cells(self, view):
        return view.cols(12 * N_LIMBS, 24 * N_LIMBS)

    def _host_in_cells(self, trace, row):
        s = START_FLAGS
        cells = [int(v) for v in trace[row, : 24 * N_LIMBS]]
        limbs = [int(v) for v in trace[row, s + 6 : s + 6 + fl.NUM_INPUT_LIMBS]]
        cells.append(limbs[0] * 2 + int(trace[row, s + 4]))
        cells += limbs[1:]
        return cells

    def _host_out_cells(self, trace, row):
        return [int(v) for v in trace[row, 12 * N_LIMBS : 24 * N_LIMBS]]

    def generate_aux(self, trace, gammas):
        return self._rlc_binding().generate_aux(trace, gammas, self.num_io)

    def eval_extra(self, lv, nv, aux_lv, aux_nv, gammas, pi, cc, aux_offset):
        self._rlc_binding().eval_extra(
            lv, nv, aux_lv, aux_nv, gammas, pi, cc, aux_offset,
            is_final=lv.col(START_FLAGS), num_io=self.num_io,
        )

    def pulse_positions(self) -> list[int]:
        pos = []
        for i in range(self.num_io):
            pos += [i * ROWS_PER_BLOCK, i * ROWS_PER_BLOCK + ROWS_PER_BLOCK - 1]
        return pos

    # ------------------------------------------------------------------ trace
    def generate_trace_and_pi(self, inputs) -> tuple[np.ndarray, np.ndarray]:
        """inputs: per instance (x: Fq12, offset: Fq12, exp_val: int)."""
        assert len(inputs) == self.num_io
        io = self.num_io
        n = ROWS_PER_BLOCK * io

        exp_limbs = np.array(
            [fq_to_u32_limbs(e % (1 << 256)) for (_, _, e) in inputs], dtype=np.uint64
        )
        flag_rows = fl.generate_flag_columns(exp_limbs)
        # one preallocated buffer, every section written in place (the
        # concatenate assembly copied the full trace twice — see g1_exp.py)
        trace_full = np.zeros((n, self.num_columns), dtype=np.uint64)
        main = trace_full.reshape(io, ROWS_PER_BLOCK, self.num_columns)[
            :, :, :NUM_MAIN
        ]
        main[:, :, START_FLAGS:] = flag_rows

        a_val = [x for (x, _, _) in inputs]
        b_val = [off for (_, off, _) in inputs]
        from .. import native

        if native.has_exp_chain("fq12_exp_chain"):
            # whole 512-row double-and-add loop in ONE native call
            # (see g1_exp.py / fq_exp.py twins)
            def to_arr(vals):
                return np.array(
                    [[int_to_limbs(v) for v in f.to_fq_list()] for f in vals],
                    dtype=np.uint64,
                )

            from ..utils.conversions import limbs_to_int as _l2i

            m3 = trace_full.reshape(io, ROWS_PER_BLOCK, self.num_columns)
            fbv = native.exp_chain(
                "fq12_exp_chain", to_arr(a_val), to_arr(b_val),
                is_square=flag_rows[0, :, 2], bits=flag_rows[:, :, 4],
                main=m3, coord_off=0, cells_off=24 * N_LIMBS,
            )
            b_val = [
                bn254.Fq12.from_fq_list([_l2i(fbv[i, k]) for k in range(12)])
                for i in range(io)
            ]
        elif native.available():
            from ..gadgets import fq12_batch as fb

            def to_arr(vals):
                return np.array(
                    [[int_to_limbs(v) for v in f.to_fq_list()] for f in vals],
                    dtype=np.uint64,
                )

            al = to_arr(a_val)  # [io, 12, 16]
            bl = to_arr(b_val)
            for r in range(ROWS_PER_BLOCK):
                main[:, r, : 12 * N_LIMBS] = al.reshape(io, -1)
                main[:, r, 12 * N_LIMBS : 24 * N_LIMBS] = bl.reshape(io, -1)
                if flag_rows[0, r, 2] == 1:
                    cells, out = fb.fq12_mul_cells_batch(al, al, None)
                    al = out
                else:
                    mask = flag_rows[:, r, 4] == 1
                    cells, out = fb.fq12_mul_cells_batch(al, bl, mask)
                    bl = np.where(mask[:, None, None], out, bl)
                main[:, r, 24 * N_LIMBS : 108 * N_LIMBS] = cells
            from ..utils.conversions import limbs_to_int as _l2i

            b_val = [
                bn254.Fq12.from_fq_list([_l2i(bl[i, k]) for k in range(12)])
                for i in range(io)
            ]
        else:
            for r in range(ROWS_PER_BLOCK):
                for i in range(io):
                    for k, v in enumerate(a_val[i].to_fq_list()):
                        main[i, r, k * N_LIMBS : (k + 1) * N_LIMBS] = int_to_limbs(v)
                    for k, v in enumerate(b_val[i].to_fq_list()):
                        main[i, r, (12 + k) * N_LIMBS : (13 + k) * N_LIMBS] = (
                            int_to_limbs(v)
                        )
                    is_sq = flag_rows[i, r, 2] == 1
                    is_mul = flag_rows[i, r, 4] == 1
                    if is_sq:
                        w = fq12g.generate_fq12_mul(a_val[i], a_val[i])
                        a_val[i] = w["product"]
                    elif is_mul:
                        w = fq12g.generate_fq12_mul(a_val[i], b_val[i])
                        b_val[i] = w["product"]
                    else:
                        w = fq12g.zero_fq12_output()
                    main[i, r, 24 * N_LIMBS : 108 * N_LIMBS] = np.array(
                        w["cells"], dtype=np.uint64
                    )

        for i, (x, off, e) in enumerate(inputs):
            expected = off * x.pow(e)
            assert b_val[i].to_fq_list() == expected.to_fq_list(), (
                "Fq12 trace generation mismatch vs oracle"
            )

        trace = trace_full[:, :NUM_MAIN]
        trace_full[:, NUM_MAIN : NUM_MAIN + 2] = pu.generate_periodic_pulse_witness(
            trace[:, START_FLAGS + 1],
            2 * fl.INPUT_LIMB_BITS,
            2 * fl.INPUT_LIMB_BITS - 2,
        )
        if self.io_binding == "pulse":
            trace_full[:, self.start_io_pulses : self.start_lookups] = (
                pu.generate_pulse(n, self.pulse_positions())
            )
        else:
            trace_full[:, self.start_final_periodic : self.start_lookups] = (
                pu.generate_periodic_pulse_witness(
                    trace[:, START_FLAGS], ROWS_PER_BLOCK, ROWS_PER_BLOCK - 1
                )
            )
        trace_full[:, self.start_lookups :] = self.rc_spec.generate(
            trace_full[:, : self.start_lookups]
        )

        pi = []
        for i, (x, off, e) in enumerate(inputs):
            for v in x.to_fq_list():
                pi += int_to_limbs(v)
            for v in off.to_fq_list():
                pi += int_to_limbs(v)
            pi += fq_to_u32_limbs(e % (1 << 256))
            for v in b_val[i].to_fq_list():
                pi += int_to_limbs(v)
        return trace_full, np.array(pi, dtype=np.uint64)

    def permutation_pairs(self):
        return self.rc_spec.pairs()

    def lookup_tables(self):
        return self.rc_spec.tables()

    # ------------------------------------------------------------ constraints
    def eval(self, lv, nv, pi, cc):
        io = self.num_io
        s = START_FLAGS
        a = [lv.cols(k * N_LIMBS, (k + 1) * N_LIMBS) for k in range(12)]
        b = [lv.cols((12 + k) * N_LIMBS, (13 + k) * N_LIMBS) for k in range(12)]
        out = fq12g.Fq12OutputView(lv, 24 * N_LIMBS)

        is_final = lv.col(s)
        is_sq = lv.col(s + 2)
        is_mul = lv.col(s + 4)
        not_final = 1 - is_final

        if self.io_binding == "rlc":
            pu.eval_periodic_pulse(
                cc, lv, nv, START_FLAGS, self.start_final_periodic,
                ROWS_PER_BLOCK, ROWS_PER_BLOCK - 1,
            )
        else:
            sum_out = None
            for i in range(io):
                v = lv.col(pu.get_pulse_col(self.start_io_pulses, 2 * i + 1))
                sum_out = v if sum_out is None else sum_out + v
            cc.constraint(is_final - sum_out)

        # public IO: direct u16 limb equality (fq12/exp.rs io format)
        limbs = lv.cols(s + 6, s + 6 + fl.NUM_INPUT_LIMBS)
        first = Val(
            limbs.arr[..., 0:1, :] if limbs.ext else limbs.arr[..., 0:1], limbs.ext
        )
        rest = Val(
            limbs.arr[..., 1:, :] if limbs.ext else limbs.arr[..., 1:], limbs.ext
        )
        restored0 = first * 2 + is_mul.lane()
        for i in range(io if self.io_binding == "pulse" else 0):
            off = FQ12_EXP_IO_LEN * i
            is_in = lv.col(pu.get_pulse_col(self.start_io_pulses, 2 * i))
            is_out = lv.col(pu.get_pulse_col(self.start_io_pulses, 2 * i + 1))
            for k in range(12):
                x_pi = pi.cols(off + k * N_LIMBS, off + (k + 1) * N_LIMBS)
                vec_equal(cc, is_in, x_pi, a[k])
            off2 = off + 12 * N_LIMBS
            for k in range(12):
                o_pi = pi.cols(off2 + k * N_LIMBS, off2 + (k + 1) * N_LIMBS)
                vec_equal(cc, is_in, o_pi, b[k])
            off3 = off2 + 12 * N_LIMBS
            ev = pi.cols(off3, off3 + 8)
            ev0 = Val(ev.arr[..., 0:1, :] if ev.ext else ev.arr[..., 0:1], ev.ext)
            ev_rest = Val(ev.arr[..., 1:, :] if ev.ext else ev.arr[..., 1:], ev.ext)
            vec_equal(cc, is_in, ev0, restored0)
            vec_equal(cc, is_in, ev_rest, rest)
            off4 = off3 + 8
            for k in range(12):
                u_pi = pi.cols(off4 + k * N_LIMBS, off4 + (k + 1) * N_LIMBS)
                vec_equal(cc, is_out, u_pi, b[k])

        # state transition
        n_a = [nv.cols(k * N_LIMBS, (k + 1) * N_LIMBS) for k in range(12)]
        n_b = [nv.cols((12 + k) * N_LIMBS, (13 + k) * N_LIMBS) for k in range(12)]
        neither = 1 - is_sq - is_mul
        for k in range(12):
            vec_equal_transition(cc, not_final * is_sq, n_a[k], out.output[k])
            vec_equal_transition(cc, not_final * is_sq, n_b[k], b[k])
            vec_equal_transition(cc, not_final * is_mul, n_a[k], a[k])
            vec_equal_transition(cc, not_final * is_mul, n_b[k], out.output[k])
            vec_equal_transition(cc, not_final * neither, n_a[k], a[k])
            vec_equal_transition(cc, not_final * neither, n_b[k], b[k])

        fl.eval_flags(cc, lv, nv, START_FLAGS)
        fq12g.eval_fq12_mul(cc, is_sq, a, a, out)
        fq12g.eval_fq12_mul(cc, is_mul, a, b, out)

        pu.eval_periodic_pulse(
            cc,
            lv,
            nv,
            START_FLAGS + 1,
            self.start_periodic,
            2 * fl.INPUT_LIMB_BITS,
            2 * fl.INPUT_LIMB_BITS - 2,
        )
        if self.io_binding == "pulse":
            pu.eval_pulse(cc, lv, nv, self.start_io_pulses, self.pulse_positions())
        self.rc_spec.eval(cc, lv, nv)
