"""Method registry (ref:src/methods/method.py:35-78 ``parse``)."""

from __future__ import annotations

from clsurvey_tpu.methods.base import Category, Method, UpdateRule  # noqa: F401


def parse(method_name: str) -> Method:
    """String -> Method object; IMM parses its mode from the name
    (``mean_IMM`` / ``mode_IMM``)."""
    from clsurvey_tpu.methods.finetune import Finetune, Joint

    exact = {
        Finetune().name: Finetune,
        Joint().name: Joint,
    }
    try:
        from clsurvey_tpu.methods.reg_based import EWC, MAS, SI
        exact.update({"EWC": EWC, "MAS": MAS, "SI": SI})
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.lwf import LWF
        exact.update({"LWF": LWF})
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.ebll import EBLL
        exact.update({"EBLL": EBLL})
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.rehearsal import (
            GEM, ICARL, FinetuneRehearsalFullMem, FinetuneRehearsalPartialMem)
        exact.update({
            "GEM": GEM, "ICARL": ICARL,
            "finetuning_rehearsal_full_mem": FinetuneRehearsalFullMem,
            "finetuning_rehearsal_partial_mem": FinetuneRehearsalPartialMem,
        })
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.packnet import PackNet
        exact.update({"packnet": PackNet})
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.hat import HAT
        exact.update({"HAT": HAT})
    except ImportError:
        pass
    try:
        from clsurvey_tpu.methods.pathnet import PathNet
        exact.update({"pathnet": PathNet})
    except ImportError:
        pass

    if method_name in exact:
        return exact[method_name]()

    if "IMM" in method_name:
        from clsurvey_tpu.methods.imm import IMM
        mode = method_name.replace("_", "").replace("IMM", "").strip()
        return IMM(mode=mode or "mean")

    raise NotImplementedError(f"Method not yet parseable: {method_name}")
