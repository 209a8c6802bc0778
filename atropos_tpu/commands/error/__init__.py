"""The 'error' command: estimate the empirical sequencing error rate.

Behavior parity with the reference (``atropos/commands/error/__init__.py``).
The quality-based estimator is a pure reduction (sum of per-base error
probabilities), which the device engine computes as a psum over shards for
pod-scale runs.
"""
from collections import defaultdict
import re

from atropos_tpu.commands.base import (
    BaseCommandRunner,
    PairedEndPipelineMixin,
    Pipeline,
    SingleEndPipelineMixin,
)
from atropos_tpu.util import qual2prob, run_interruptible


class CommandRunner(BaseCommandRunner):
    name = "error"

    def __call__(self):
        if not self.delivers_qualities:
            raise ValueError("Cannot estimate error rate without base qualities")

        if self.algorithm == "quality":
            estimator_class = BaseQualityErrorEstimator
        elif self.algorithm == "shadow":
            estimator_class = ShadowRegressionErrorEstimator

        estimator_args = dict(max_read_len=self.max_bases)
        if self.paired:
            estimator = PairedErrorEstimator(
                estimator_class=estimator_class, **estimator_args
            )
        else:
            estimator = estimator_class(**estimator_args)

        self.summary["errorrate"] = estimator_args

        self.summary.update(mode="serial", threads=1)
        return run_interruptible(estimator, self, raise_on_error=True)


class ErrorEstimator(SingleEndPipelineMixin, Pipeline):
    """Base class for error estimators."""

    def __init__(self, max_read_len):
        super().__init__()
        self.total_len = 0
        self.max_read_len = max_read_len

    def handle_reads(self, context, read1, read2=None):
        raise NotImplementedError()

    def estimate(self):
        raise NotImplementedError()

    def finish(self, summary, **kwargs):
        super().finish(summary)
        estimate, details = self.estimate()
        summary["errorrate"].update(
            estimate=(estimate,),
            total_len=(self.total_len,),
            details=(details,),
        )


class BaseQualityErrorEstimator(ErrorEstimator):
    """Error estimation from base qualities (known to overestimate)."""

    def __init__(self, max_read_len=None):
        super().__init__(max_read_len)
        self.total_qual = 0.0

    def handle_reads(self, context, read1, read2=None):
        quals = read1.qualities
        readlen = len(quals)
        if self.max_read_len and self.max_read_len < readlen:
            readlen = self.max_read_len
            quals = quals[:readlen]
        self.total_qual += sum(qual2prob(qchar) for qchar in quals)
        self.total_len += readlen

    def estimate(self):
        return (self.total_qual / self.total_len, None)


FILTER_RE = re.compile("A+|C+|G+|T+|.*N.*")


class ShadowRegressionErrorEstimator(ErrorEstimator):
    """Shadow-regression error estimation (Wang et al. 2012).

    Like the reference, this shells out to the R ShadowRegression package;
    it exists for CLI parity and raises a clear error when R is
    unavailable.
    """

    def __init__(self, method="sub", max_read_len=None, rscript_exe="Rscript"):
        super().__init__(max_read_len)
        self.seqs = defaultdict(lambda: 0)
        self.method = method
        self.rscript_exe = rscript_exe

    def handle_reads(self, context, read1, read2=None):
        seq = read1.sequence
        readlen = len(seq)
        if self.max_read_len and self.max_read_len < readlen:
            readlen = self.max_read_len
            seq = seq[:readlen]
        if FILTER_RE.fullmatch(seq):
            return
        self.seqs[seq] += 1
        self.total_len += readlen

    def estimate(self):
        import csv
        import os
        import subprocess
        import tempfile

        from atropos_tpu import AtroposError

        script_template = (
            'library(ShadowRegression)\n'
            'errorRates = getErrorRates("{reads}", type="{method}")\n'
            'write.table(errorRates$perReadER, "{per_read}", sep="\\t", '
            "quote=F, col.names=F, row.names=T)\n"
            'write.table(errorRates$cycleER, "{per_cycle}", sep="\\t", '
            "quote=F, col.names=F, row.names=T)\n"
        )
        tempfiles = tuple(tempfile.mkstemp()[1] for _ in range(4))
        read_counts, per_read, per_cycle, script_file = tempfiles
        try:
            with open(read_counts, "wt") as out:
                writer = csv.writer(out, delimiter=" ")
                writer.writerows(
                    sorted(self.seqs.items(), reverse=True, key=lambda i: i[1])
                )
            with open(script_file, "wt") as out:
                out.write(
                    script_template.format(
                        reads=read_counts,
                        method=self.method,
                        per_read=per_read,
                        per_cycle=per_cycle,
                    )
                )
            proc = subprocess.Popen(
                [self.rscript_exe, "--vanilla", script_file],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
            with proc:
                stdout, stderr = proc.communicate()
                if proc.returncode != 0:
                    raise AtroposError(
                        "R script failed: rc={}; stdout={}; stderr={}".format(
                            proc.returncode, stdout, stderr
                        )
                    )
            with open(per_read, "rt") as infile:
                reader = csv.reader(infile, delimiter="\t")
                per_read_error = dict(reader)
                if len(per_read_error) != 4:
                    raise AtroposError("Invalid output from R script")
            with open(per_cycle, "rt") as infile:
                reader = csv.reader(infile, delimiter="\t")
                per_cycle_error = list(row[0:3] for row in reader)
                if not per_cycle_error:
                    raise AtroposError("Invalid output from R script")

            return (
                per_read_error["error rate"],
                dict(per_read=per_read_error, per_cycle=per_cycle_error),
            )
        finally:
            for path in tempfiles:
                os.remove(path)


class PairedErrorEstimator(PairedEndPipelineMixin, Pipeline):
    """Estimator over both reads of a pair."""

    def __init__(self, estimator_class=BaseQualityErrorEstimator, **kwargs):
        super().__init__()
        self.estimator1 = estimator_class(**kwargs)
        self.estimator2 = estimator_class(**kwargs)

    def handle_reads(self, context, read1, read2):
        self.estimator1.handle_reads(context, read1)
        self.estimator2.handle_reads(context, read2)

    def finish(self, summary, **kwargs):
        super().finish(summary)
        estimate1, details1 = self.estimator1.estimate()
        estimate2, details2 = self.estimator2.estimate()
        summary["errorrate"].update(
            estimate=(estimate1, estimate2),
            total_len=(self.estimator1.total_len, self.estimator2.total_len),
            details=(details1, details2),
        )
