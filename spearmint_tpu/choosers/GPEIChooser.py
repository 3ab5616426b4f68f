"""GP-EI chooser, grid-only (no off-grid optimization).

Parity: reference ``chooser/GPEIChooser.py`` (≈250 LoC, SURVEY.md §2
#17): identical fully-Bayesian GP machinery to GPEIOptChooser but the
suggestion is the EI argmax over the existing Sobol candidates — no
L-BFGS refinement, never invents points.  Shares the flagship's host
shell with ``optimize`` disabled.
"""

from __future__ import annotations

from spearmint_tpu.choosers.GPEIOptChooser import GPEIOptChooser
from spearmint_tpu.utils.args import unpack_args


def init(expt_dir, arg_string=""):
    return GPEIChooser(expt_dir, **unpack_args(arg_string))


class GPEIChooser(GPEIOptChooser):
    def __init__(self, expt_dir, **kwargs):
        super().__init__(expt_dir, **kwargs)
        self.optimize = False
