"""Evaluators (reference ``medmm/evaluation/evaluator.py``).

Same four evaluators, same metric computations (sklearn for accuracy / AUC /
macro-F1; own survival metrics replacing scikit-survival), and the same
``* metric: X%`` stdout format that ``tools/parse_test_res.py`` scrapes.
"""

from __future__ import annotations

import os.path as osp
from collections import OrderedDict, defaultdict

import numpy as np

from ..utils.registry import Registry
from .survival_metrics import (
    concordance_index_censored,
    concordance_index_ipcw,
)

EVALUATOR_REGISTRY = Registry("EVALUATOR")


def auc_com(y_true, y_pred, num_cls) -> float:
    """One-vs-rest mean AUC (reference ``evaluator.py:26-40``)."""
    from sklearn.metrics import roc_auc_score

    auc_scores = []
    for class_idx in range(num_cls):
        y_true_class = [1 if y == class_idx else 0 for y in y_true]
        y_pred_class = [pred[class_idx] for pred in y_pred]
        auc_scores.append(roc_auc_score(y_true_class, y_pred_class))
    return float(sum(auc_scores) / len(auc_scores) * 100)


class EvaluatorBase:
    def __init__(self, cfg):
        self.cfg = cfg

    def reset(self):
        raise NotImplementedError

    def process(self, *args, **kwargs):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError


@EVALUATOR_REGISTRY.register()
class Classification(EvaluatorBase):
    """Accuracy / error / mean one-vs-rest AUC / macro-F1
    (reference ``evaluator.py:57-171``)."""

    def __init__(self, cfg, lab2cname=None, **kwargs):
        super().__init__(cfg)
        self._lab2cname = lab2cname
        self._per_class_res = None
        if cfg.TEST.PER_CLASS_RESULT:
            assert lab2cname is not None
            self._per_class_res = defaultdict(list)
        self.reset()

    def reset(self):
        self._correct = 0
        self._total = 0
        self._y_true = []
        self._y_pred = []
        self._m_out = []
        if self._per_class_res is not None:
            self._per_class_res = defaultdict(list)

    def process(self, mo, gt):
        mo = np.asarray(mo)
        gt = np.asarray(gt)
        pred = mo.argmax(axis=1)
        matches = (pred == gt).astype(np.float64)
        self._correct += int(matches.sum())
        self._total += int(gt.shape[0])
        self._m_out.append(mo)
        self._y_true.extend(gt.tolist())
        self._y_pred.extend(pred.tolist())
        if self._per_class_res is not None:
            for i, label in enumerate(gt.tolist()):
                self._per_class_res[label].append(int(matches[i]))

    def evaluate(self):
        from sklearn.metrics import classification_report, confusion_matrix, f1_score

        results = OrderedDict()
        acc = 100.0 * self._correct / self._total
        err = 100.0 - acc
        labels = np.unique(self._y_true)
        cls_report = classification_report(
            self._y_true, self._y_pred, labels=labels, zero_division=1
        )
        macro_f1 = 100.0 * f1_score(
            self._y_true, self._y_pred, average="macro", labels=labels
        )
        m_out = np.concatenate(self._m_out, axis=0)
        auc_score = auc_com(self._y_true, m_out, int(labels.max() + 1))

        results["accuracy"] = acc
        results["error_rate"] = err
        results["AUC"] = auc_score
        results["macro_f1"] = macro_f1

        print(
            "=> result\n"
            f"* total: {self._total:,}\n"
            f"* correct: {self._correct:,}\n"
            f"* accuracy: {acc:.1f}%\n"
            f"* error: {err:.1f}%\n"
            f"* AUC: {auc_score:.1f}%\n"
            f"* macro_f1: {macro_f1:.1f}%\n"
        )
        print(cls_report)

        if self._per_class_res is not None:
            labels = sorted(self._per_class_res.keys())
            print("=> per-class result")
            accs = []
            for label in labels:
                classname = self._lab2cname[label]
                res = self._per_class_res[label]
                correct, total = sum(res), len(res)
                acc_c = 100.0 * correct / total
                accs.append(acc_c)
                print(
                    f"* class: {label} ({classname})\t"
                    f"total: {total:,}\tcorrect: {correct:,}\tacc: {acc_c:.1f}%"
                )
            mean_acc = float(np.mean(accs))
            print(f"* average: {mean_acc:.1f}%")
            results["perclass_accuracy"] = mean_acc

        if self.cfg.TEST.COMPUTE_CMAT:
            cmat = confusion_matrix(self._y_true, self._y_pred, normalize="true")
            save_path = osp.join(self.cfg.OUTPUT_DIR, "cmat.npy")
            np.save(save_path, cmat)
            print(f"Confusion matrix is saved to {save_path}")

        return results


@EVALUATOR_REGISTRY.register()
class Classification_UMEML(Classification):
    """Identical metrics; kept as a separate registered name for config
    compatibility (reference ``evaluator.py:174-291`` only differs in how it
    stacks batched outputs, which :meth:`process` already handles)."""


@EVALUATOR_REGISTRY.register()
class Survival(EvaluatorBase):
    """C-index over risk = -sum(S) (reference ``evaluator.py:293-341``)."""

    def __init__(self, cfg, **kwargs):
        super().__init__(cfg)
        self.reset()

    def reset(self):
        self._total = 0
        self._all_risk_scores = []
        self._all_censorships = []
        self._all_event_times = []

    def process(self, S, censorship, survival_month):
        S = np.asarray(S)
        censorship = np.asarray(censorship)
        survival_month = np.asarray(survival_month)
        self._total += int(censorship.shape[0])
        risk = -S.sum(axis=1)
        self._all_risk_scores.extend(risk.tolist())
        self._all_censorships.extend(censorship.tolist())
        self._all_event_times.extend(survival_month.tolist())

    def evaluate(self):
        results = OrderedDict()
        c_index = 100.0 * concordance_index_censored(
            (1 - np.array(self._all_censorships)).astype(bool),
            np.array(self._all_event_times),
            np.array(self._all_risk_scores),
            tied_tol=1e-08,
        )[0]
        results["c_index"] = c_index
        print("=> result\n" f"* total: {self._total:,}\n" f"* C-Index: {c_index:.1f}%\n")
        return results


@EVALUATOR_REGISTRY.register()
class Survival_UMEML(EvaluatorBase):
    """logits -> hazards -> S -> risk; NaN filtering; C-index + IPCW C-index
    against the pooled train+val censoring baseline
    (reference ``evaluator.py:343-428``)."""

    def __init__(self, cfg, all_survival=None, bins=None, **kwargs):
        super().__init__(cfg)
        self.all_survival = all_survival  # (event_bool, time) tuple
        self.bins = bins
        self.reset()

    def reset(self):
        self._total = 0
        self._all_risk_scores = []
        self._all_censorships = []
        self._all_event_times = []
        self._all_patient_ids = []
        self.all_risk_by_bin_scores = []

    def process(self, patient_id, logits, censorship, survival_month):
        logits = np.asarray(logits, dtype=np.float64)
        censorship = np.asarray(censorship)
        survival_month = np.asarray(survival_month)
        self._total += int(censorship.shape[0])
        hazards = 1.0 / (1.0 + np.exp(-logits))
        S = np.cumprod(1.0 - hazards, axis=1)
        risk = -S.sum(axis=1)
        self._all_risk_scores.extend(risk.tolist())
        self._all_patient_ids.extend(list(patient_id))
        self._all_censorships.extend(censorship.tolist())
        self._all_event_times.extend(survival_month.tolist())
        self.all_risk_by_bin_scores.extend(S.tolist())

    def evaluate(self):
        results = OrderedDict()
        risk = np.array(self._all_risk_scores, dtype=np.float64)
        cens = np.array(self._all_censorships, dtype=np.float64)
        times = np.array(self._all_event_times, dtype=np.float64)
        keep = ~np.isnan(risk)
        risk, cens, times = risk[keep], cens[keep], times[keep]

        c_index = concordance_index_censored(
            (1 - cens).astype(bool), times, risk, tied_tol=1e-08
        )[0]

        c_index_ipcw = 0.0
        try:
            c_index_ipcw = concordance_index_ipcw(
                self.all_survival, ((1 - cens).astype(bool), times), estimate=risk
            )[0]
        except Exception:
            print("An error occured while computing c-index ipcw")
            c_index_ipcw = 0.0

        c_index, c_index_ipcw = 100.0 * c_index, 100.0 * c_index_ipcw
        results["c_index"] = c_index
        results["c_index_ipcw"] = c_index_ipcw
        print(
            "=> result\n"
            f"* total: {self._total:,}\n"
            f"* cindex: {c_index:.2f}%\n"
            f"* cindex_ipcw: {c_index_ipcw:.2f}%\n"
        )
        return results


def build_evaluator(cfg, **kwargs):
    name = cfg.TEST.EVALUATOR
    return EVALUATOR_REGISTRY.get(name)(cfg, **kwargs)
