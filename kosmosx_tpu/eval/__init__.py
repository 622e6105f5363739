"""Evaluation harness.

The reference sketches an eval-metric taxonomy but never implements it: the
perplexity / BLEU / ROUGE / F1 code is commented out
(/root/reference/tests/test_benchmarking.py:225-248,294-311) and the SOP doc
only lists the metric names (/root/reference/tests/README.md:102-126). This
package implements the taxonomy for real: a jitted perplexity evaluator over
packed token streams and self-contained text-overlap metrics (no nltk / no
network).
"""

from kosmosx_tpu.eval.perplexity import (evaluate_perplexity,
                                         make_eval_step)
from kosmosx_tpu.eval.text_metrics import (bleu, exact_match, rouge_l,
                                           token_f1)

__all__ = ["evaluate_perplexity", "make_eval_step", "bleu", "rouge_l",
           "token_f1", "exact_match"]
