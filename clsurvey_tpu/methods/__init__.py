"""Method registry (ref:src/methods/method.py:35-78 ``parse``)."""

from __future__ import annotations

from clsurvey_tpu.methods.base import Category, Method, UpdateRule  # noqa: F401


def parse(method_name: str) -> Method:
    """String -> Method object; IMM parses its mode from the name
    (``mean_IMM`` / ``mode_IMM``).

    Imports are direct on purpose: a broken method module must crash with
    its real traceback, not masquerade as "Method not yet parseable"."""
    from clsurvey_tpu.methods.ebll import EBLL
    from clsurvey_tpu.methods.finetune import Finetune, Joint
    from clsurvey_tpu.methods.hat import HAT
    from clsurvey_tpu.methods.lwf import LWF
    from clsurvey_tpu.methods.packnet import PackNet
    from clsurvey_tpu.methods.pathnet import PathNet
    from clsurvey_tpu.methods.reg_based import EWC, MAS, SI
    from clsurvey_tpu.methods.rehearsal import (
        GEM, ICARL, FinetuneRehearsalFullMem, FinetuneRehearsalPartialMem)

    exact = {
        Finetune().name: Finetune,
        Joint().name: Joint,
        "EWC": EWC, "MAS": MAS, "SI": SI,
        "LWF": LWF, "EBLL": EBLL,
        "GEM": GEM, "ICARL": ICARL,
        "finetuning_rehearsal_full_mem": FinetuneRehearsalFullMem,
        "finetuning_rehearsal_partial_mem": FinetuneRehearsalPartialMem,
        "packnet": PackNet, "HAT": HAT, "pathnet": PathNet,
    }
    if method_name in exact:
        return exact[method_name]()

    if "IMM" in method_name:
        from clsurvey_tpu.methods.imm import IMM
        mode = method_name.replace("_", "").replace("IMM", "").strip()
        return IMM(mode=mode or "mean")

    raise NotImplementedError(f"Method not yet parseable: {method_name}")
