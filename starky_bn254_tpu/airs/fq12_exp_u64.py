"""Fq12 exponentiation with a u64 exponent: 128 rows per instance.

Equivalent of reference `Fq12ExpU64Stark` (src/fields/fq12_u64/exp_u64.rs):
same multiply gadget as Fq12ExpAir but driven by the 6-column u64 flag
machine (no limb rotation, no periodic pulse). The MSM-style chaining test
(circuit.rs:437-489) composes these blocks to prove products of powers.

Row layout: [ a(192) | b(192) | Fq12Output(1344) | flags_u64(6) ] = 1734
main cols + io-pulses(1+4*num_io) + split range check (same targets as
Fq12ExpAir). Public IO per instance: 36*N_LIMBS + 1 (exp_val is one cell).
"""

from __future__ import annotations

import numpy as np

from ..gadgets import flags_u64 as fl64
from ..gadgets import fq12 as fq12g
from ..gadgets import pulse as pu
from ..gadgets import range_check as rc
from ..gadgets.equals import vec_equal, vec_equal_transition
from ..stark.air import Air
from ..stark.field_expr import Val
from ..utils.conversions import N_LIMBS, int_to_limbs

NUM_MAIN = 108 * N_LIMBS + fl64.NUM_FLAGS_U64_COLS  # 1734
START_FLAGS = 108 * N_LIMBS
START_RANGE_CHECK = 24 * N_LIMBS
NUM_RANGE_CHECK = 84 * N_LIMBS - 12
RANGE_TARGETS = list(range(START_RANGE_CHECK, START_RANGE_CHECK + NUM_RANGE_CHECK))
FQ12_EXP_U64_IO_LEN = 36 * N_LIMBS + 1  # 577
ROWS_PER_BLOCK = fl64.NUM_FLAG_U64_ROWS  # 128


class Fq12ExpU64Air(Air):
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
        if io_binding == "pulse":
            self.start_io_pulses = NUM_MAIN
            self.start_lookups = self.start_io_pulses + 1 + 4 * num_io
        else:
            self.start_final_periodic = NUM_MAIN
            self.start_lookups = NUM_MAIN + 2
        self.rc_spec = rc.RangeCheckSpec(range_check, self.start_lookups, RANGE_TARGETS)
        self.num_columns = self.start_lookups + self.rc_spec.num_added
        self.num_public_inputs = FQ12_EXP_U64_IO_LEN * num_io

    def aux_extra_width(self) -> int:
        return 2 if self.io_binding == "rlc" else 0

    def _rlc_binding(self):
        from ..stark.io_rlc import RlcIoBinding

        return RlcIoBinding(
            io_len=FQ12_EXP_U64_IO_LEN,
            in_len=24 * N_LIMBS + 1,
            rows_per_block=ROWS_PER_BLOCK,
            input_cells=self._rlc_input_cells,
            output_cells=self._rlc_output_cells,
            host_in_cells=self._host_in_cells,
            host_out_cells=self._host_out_cells,
        )

    def _rlc_input_cells(self, view):
        from ..stark.field_expr import lane_concat

        s = START_FLAGS
        ab = view.cols(0, 24 * N_LIMBS)
        restored = (view.col(s + 5) * 2 + view.col(s + 3)).lane()
        return lane_concat([ab, restored])

    def _rlc_output_cells(self, view):
        return view.cols(12 * N_LIMBS, 24 * N_LIMBS)

    def _host_in_cells(self, trace, row):
        s = START_FLAGS
        cells = [int(v) for v in trace[row, : 24 * N_LIMBS]]
        cells.append(int(trace[row, s + 5]) * 2 + int(trace[row, s + 3]))
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
        """inputs: per instance (x: Fq12, offset: Fq12, exp_val: int < 2^64)."""
        assert len(inputs) == self.num_io
        io = self.num_io
        n = ROWS_PER_BLOCK * io

        exps = np.array([e % (1 << 64) for (_, _, e) in inputs], dtype=np.uint64)
        flag_rows = fl64.generate_flag_u64_columns(exps)
        # one preallocated buffer, every section written in place (the
        # concatenate assembly copied the full trace twice — see g1_exp.py)
        trace_full = np.zeros((n, self.num_columns), dtype=np.uint64)
        main = trace_full.reshape(io, ROWS_PER_BLOCK, self.num_columns)[
            :, :, :NUM_MAIN
        ]
        main[:, :, START_FLAGS:] = flag_rows

        a_val = [x for (x, _, _) in inputs]
        b_val = [off for (_, off, _) in inputs]
        from .. import bn254, native

        if native.available():
            from ..gadgets import fq12_batch as fb
            from ..utils.conversions import limbs_to_int as _l2i

            al = np.array(
                [[int_to_limbs(v) for v in f.to_fq_list()] for f in a_val],
                dtype=np.uint64,
            )
            bl = np.array(
                [[int_to_limbs(v) for v in f.to_fq_list()] for f in b_val],
                dtype=np.uint64,
            )
            for r in range(ROWS_PER_BLOCK):
                main[:, r, : 12 * N_LIMBS] = al.reshape(io, -1)
                main[:, r, 12 * N_LIMBS : 24 * N_LIMBS] = bl.reshape(io, -1)
                if flag_rows[0, r, 1] == 1:
                    cells, out = fb.fq12_mul_cells_batch(al, al, None)
                    al = out
                else:
                    mask = flag_rows[:, r, 3] == 1
                    cells, out = fb.fq12_mul_cells_batch(al, bl, mask)
                    bl = np.where(mask[:, None, None], out, bl)
                main[:, r, 24 * N_LIMBS : 108 * N_LIMBS] = cells
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
                    is_sq = flag_rows[i, r, 1] == 1
                    is_mul = flag_rows[i, r, 3] == 1
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
            expected = off * x.pow(e % (1 << 64))
            assert b_val[i].to_fq_list() == expected.to_fq_list()

        trace = trace_full[:, :NUM_MAIN]
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
            pi.append(e % (1 << 64))
            for v in b_val[i].to_fq_list():
                pi += int_to_limbs(v)
        # exp_val cell may exceed u16 but is a valid canonical field value
        arr = np.zeros(len(pi), dtype=np.uint64)
        for k, v in enumerate(pi):
            arr[k] = v
        return trace_full, arr

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
        is_sq = lv.col(s + 1)
        is_mul = lv.col(s + 3)
        val = lv.col(s + 5)
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

        restored = val * 2 + is_mul
        for i in range(io if self.io_binding == "pulse" else 0):
            off = FQ12_EXP_U64_IO_LEN * i
            is_in = lv.col(pu.get_pulse_col(self.start_io_pulses, 2 * i))
            is_out = lv.col(pu.get_pulse_col(self.start_io_pulses, 2 * i + 1))
            for k in range(12):
                x_pi = pi.cols(off + k * N_LIMBS, off + (k + 1) * N_LIMBS)
                vec_equal(cc, is_in, x_pi, a[k])
            off2 = off + 12 * N_LIMBS
            for k in range(12):
                o_pi = pi.cols(off2 + k * N_LIMBS, off2 + (k + 1) * N_LIMBS)
                vec_equal(cc, is_in, o_pi, b[k])
            ev = pi.col(off2 + 12 * N_LIMBS)
            cc.constraint(is_in * (ev - restored))
            off4 = off2 + 12 * N_LIMBS + 1
            for k in range(12):
                u_pi = pi.cols(off4 + k * N_LIMBS, off4 + (k + 1) * N_LIMBS)
                vec_equal(cc, is_out, u_pi, b[k])

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

        fl64.eval_flags_u64(cc, lv, nv, START_FLAGS)
        fq12g.eval_fq12_mul(cc, is_sq, a, a, out)
        fq12g.eval_fq12_mul(cc, is_mul, a, b, out)

        if self.io_binding == "pulse":
            pu.eval_pulse(cc, lv, nv, self.start_io_pulses, self.pulse_positions())
        self.rc_spec.eval(cc, lv, nv)
