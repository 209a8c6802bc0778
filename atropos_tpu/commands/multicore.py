"""Single-node multiprocess parallelism (fork workers + queues).

This is the CLI-compatible ``--threads`` backend, architecturally
equivalent to the reference (``atropos/commands/multicore.py`` +
``atropos/commands/trim/multicore.py``): N-1 forked workers consume read
batches from a bounded input queue while the main process acts as the
reader; results either go to a dedicated writer process (optionally
order-preserving) or each worker writes its own ``.N``-suffixed shard
(parallel-write mode, the fastest); worker summaries are merged by the
typed merge algebra.

Note: forked workers never touch the device — device parallelism is the
mesh-sharded path (:mod:`atropos_tpu.parallel`), and a forked process must
not reuse the parent's accelerator runtime.
"""
import inspect
import logging
from multiprocessing import Process, Queue, Value
import os
from queue import Empty, Full
import sys
import time

from atropos_tpu import AtroposError
from atropos_tpu.util import run_interruptible

RETRY_INTERVAL = 5
"""Max time to wait between retrying operations."""

CONTROL_ACTIVE = -1
"""Controlled process should run normally."""
CONTROL_ERROR = -2
"""Controlled process should exit."""


class MulticoreError(AtroposError):
    """Base error for parallel processes."""


class Done(MulticoreError):
    """Raised when a process exits normally."""


class Killed(MulticoreError):
    """Raised when a process is killed."""


class Control:
    """Shared (long) value for control-plane communication."""

    def __init__(self, initial_value=CONTROL_ACTIVE):
        self.control = Value("l", initial_value)

    def check_value(self, value, lock=False):
        return self.get_value(lock=lock) == value

    def check_value_positive(self, lock=False):
        return self.get_value(lock=lock) >= 0

    def get_value(self, lock=True):
        if lock:
            with self.control.get_lock():
                return self.control.value
        return self.control.value

    def set_value(self, value):
        with self.control.get_lock():
            self.control.value = value


class PendingQueue:
    """Buffer for out-of-order batches, popped in priority order."""

    def __init__(self, max_size=None):
        self.queue = {}
        self.max_size = max_size
        self.min_priority = None

    def push(self, priority, value):
        if self.full:
            raise Full()
        if priority in self.queue:
            raise ValueError("Duplicate priority value: {}".format(priority))
        self.queue[priority] = value
        if self.min_priority is None or priority < self.min_priority:
            self.min_priority = priority

    def pop(self):
        if self.empty:
            raise Empty()
        value = self.queue.pop(self.min_priority)
        if self.empty:
            self.min_priority = None
        else:
            self.min_priority = min(self.queue.keys())
        return value

    @property
    def full(self):
        return self.max_size and len(self.queue) >= self.max_size

    @property
    def empty(self):
        return len(self.queue) == 0


class ParallelPipelineMixin:
    """Adds per-worker batch tracking to a Pipeline."""

    def start(self, **kwargs):
        super().start(**kwargs)
        self.seen_batches = set()

    def process_batch(self, batch):
        self.seen_batches.add(batch[0]["index"])
        super().process_batch(batch)

    def finish(self, summary, worker=None):
        super().finish(summary, worker=worker)
        logging.getLogger().debug(
            "%s finished; processed %d batches, %d reads",
            worker.name if worker else "worker",
            len(self.seen_batches),
            sum(self.record_counts.values()),
        )


class WorkerProcess(Process):
    """Forked worker executing a pipeline over dequeued batches."""

    def __init__(self, index, input_queue, pipeline, summary_queue, timeout):
        super().__init__(name="Worker process {}".format(index))
        self.index = index
        self.input_queue = input_queue
        self.pipeline = pipeline
        self.summary_queue = summary_queue
        self.timeout = timeout

    def run(self):
        logging.getLogger().debug("%s running under pid %d", self.name, os.getpid())

        summary = {}

        def iter_batches():
            while True:
                batch = dequeue(
                    self.input_queue,
                    wait_message="{} waiting on batch {{}}".format(self.name),
                    timeout=self.timeout,
                )
                yield batch

        def enqueue_summary():
            enqueue(
                self.summary_queue,
                (self.index, self.pipeline.seen_batches, summary),
                wait_message="{} waiting to queue summary {{}}".format(self.name),
                timeout=self.timeout,
            )

        try:
            self.pipeline.start(worker=self)

            try:
                for batch in iter_batches():
                    if batch is None:
                        break
                    self.pipeline.process_batch(batch)
            finally:
                self.pipeline.finish(summary, worker=self)

            logging.getLogger().debug("%s finished normally", self.name)
        except Exception as err:
            logging.getLogger().error(
                "Unexpected error in %s", self.name, exc_info=True
            )
            summary["exception"] = err

        enqueue_summary()


class ParallelPipelineRunner:
    """Reader (main process) + N worker processes + summary merge."""

    def __init__(self, command_runner, pipeline, threads=None):
        self.threads = threads or command_runner.threads
        if self.threads < 2:
            raise ValueError("'threads' must be >= 2")
        self.command_runner = command_runner
        self.pipeline = pipeline
        self.timeout = max(command_runner.process_timeout, RETRY_INTERVAL)
        self.input_queue = Queue(command_runner.read_queue_size)
        self.summary_queue = Queue(self.threads)
        self.worker_processes = None
        self.num_batches = None
        self.seen_summaries = None
        self.seen_batches = None

    def ensure_alive(self):
        ensure_processes(self.worker_processes)

    def after_enqueue(self):
        pass

    def finish(self):
        pass

    def run(self):
        retcode = run_interruptible(self)
        self.terminate(retcode)
        return retcode

    def terminate(self, retcode):
        if self.worker_processes is None:
            logging.getLogger().warning("Called terminate before starting workers")
        else:
            logging.getLogger().debug("Exiting all processes")
            for process in self.worker_processes:
                kill(process, retcode, self.timeout)

    def __call__(self):
        worker_args = (
            self.input_queue,
            self.pipeline,
            self.summary_queue,
            self.timeout,
        )
        # reserve one slot for the reader (the main process); reclaim after
        self.worker_processes = launch_workers(self.threads - 1, worker_args)

        self.num_batches = enqueue_all(
            self.command_runner.iterator(),
            self.input_queue,
            self.timeout,
            self.ensure_alive,
        )

        logging.getLogger().debug(
            "Main loop complete; saw %d batches", self.num_batches
        )

        # poison pills
        enqueue_all(
            (None,) * self.threads, self.input_queue, self.timeout,
            self.ensure_alive,
        )

        self.after_enqueue()

        # reader is done; its slot becomes one more worker
        self.worker_processes.extend(
            launch_workers(1, worker_args, offset=self.threads - 1)
        )

        def summary_timeout_callback():
            try:
                ensure_processes(
                    self.worker_processes,
                    "Workers are still alive and haven't returned summaries: {}",
                    alive=False,
                )
            except Exception as err:
                logging.getLogger().error(err)

        wait_on(
            self.summary_queue.full,
            wait_message="Waiting on worker summaries {}",
            timeout=self.timeout,
            wait=True,
            timeout_callback=summary_timeout_callback,
        )

        self.seen_summaries = set()
        self.seen_batches = set()

        def summary_fail_callback():
            missing_summaries = set(range(1, self.threads)) - self.seen_summaries
            raise AtroposError(
                "Missing summaries from processes %s",
                ",".join(str(summ) for summ in missing_summaries),
            )

        for _ in range(1, self.threads + 1):
            batch = dequeue(self.summary_queue, fail_callback=summary_fail_callback)
            worker_index, worker_batches, worker_summary = batch
            if worker_summary is None:
                raise MulticoreError(
                    "Worker process {} died unexpectedly".format(worker_index)
                )
            elif (
                "exception" in worker_summary
                and worker_summary["exception"] is not None
            ):
                raise AtroposError(
                    "Worker process {} died unexpectedly".format(worker_index),
                    worker_summary["exception"],
                )
            self.seen_summaries.add(worker_index)
            self.seen_batches |= worker_batches
            self.command_runner.summary.merge(worker_summary)

        if self.num_batches > 0:
            missing_batches = set(range(1, self.num_batches + 1)) - self.seen_batches
            if len(missing_batches) > 0:
                raise AtroposError(
                    "Workers did not process batches {}".format(
                        ",".join(str(batch) for batch in missing_batches)
                    )
                )

        self.finish()


# -- trim-specific result plumbing -----------------------------------------


class ParallelTrimPipelineRunner(ParallelPipelineRunner):
    """ParallelPipelineRunner with an optional writer process."""

    def __init__(
        self, command_runner, pipeline, threads, writer_manager=None,
        queue_manager=None,
    ):
        super().__init__(command_runner, pipeline, threads)
        self.writer_manager = writer_manager
        self.queue_manager = queue_manager

    def ensure_alive(self):
        super().ensure_alive()
        if self.writer_manager and not self.writer_manager.is_active():
            raise MulticoreError("Writer process exited")

    def after_enqueue(self):
        if self.writer_manager:
            self.writer_manager.set_num_batches(self.num_batches)

    def finish(self):
        if self.writer_manager:
            self.writer_manager.wait()
        if self.queue_manager:
            self.queue_manager.shutdown()

    def terminate(self, retcode):
        super().terminate(retcode)
        if self.writer_manager:
            self.writer_manager.terminate(retcode)


class QueueResultHandler:
    """ResultHandler forwarding results to the writer's queue."""

    def __init__(self, queue):
        self.queue = queue
        self.message = None
        self.timeout = None

    def start(self, worker):
        self.message = "{} waiting to queue result {{}}".format(worker.name)
        self.timeout = worker.timeout

    def write_result(self, batch_num, result):
        enqueue(
            self.queue,
            (batch_num, result),
            wait_message=self.message,
            timeout=self.timeout,
        )

    def finish(self, total_batches=None):
        pass


class CompressingWorkerResultHandler:
    """Joins + compresses result strings in the worker (worker-compression
    placement; best at >= 8 threads per the reference's benchmarks)."""

    def __init__(self, handler):
        self.handler = handler
        self.file_compressors = None

    def start(self, worker):
        self.handler.start(worker)
        self.file_compressors = {}

    def write_result(self, batch_num, result):
        self.handler.write_result(
            batch_num, dict(self.prepare_file(*item) for item in result.items())
        )

    def prepare_file(self, path, strings):
        compressor = self.get_compressor(path)
        if compressor:
            return (
                (path, "wb"),
                compressor.compress(b"".join(s.encode() for s in strings)),
            )
        return ((path, "wt"), "".join(strings))

    def get_compressor(self, filename):
        from atropos_tpu.io.compression import get_compressor

        if filename not in self.file_compressors:
            self.file_compressors[filename] = get_compressor(filename)
        return self.file_compressors[filename]

    def finish(self, total_batches=None):
        self.handler.finish(total_batches=total_batches)


class ResultProcess(Process):
    """Writer process consuming (batch_num, {path: data}) results."""

    def __init__(self, result_handler, queue, control, timeout=60):
        super().__init__(name="Result process")
        self.result_handler = result_handler
        self.queue = queue
        self.control = control
        self.timeout = timeout
        self.seen_batches = set()
        self.num_batches = None

    def run(self):
        logging.getLogger().debug(
            "Writer process %s running under pid %d", self.name, os.getpid()
        )

        def fail_callback():
            if self.num_batches is None and self.control.check_value_positive():
                self.num_batches = self.control.get_value()
            if (
                self.num_batches is not None
                and len(self.seen_batches) >= self.num_batches
            ):
                raise Done()

        def timeout_callback():
            if self.num_batches is not None:
                missing = set(range(1, self.num_batches + 1)) - self.seen_batches
                logging.getLogger().error(
                    "Result thread still missing batches %s of %d",
                    ",".join(str(i) for i in missing),
                    self.num_batches,
                )

        def iter_batches():
            while True:
                batch = dequeue(
                    self.queue,
                    wait_message="Result process waiting on result {}",
                    timeout=self.timeout,
                    fail_callback=fail_callback,
                    timeout_callback=timeout_callback,
                )
                yield batch

        try:
            self.result_handler.start(self)

            for batch_num, result in iter_batches():
                self.seen_batches.add(batch_num)
                self.result_handler.write_result(batch_num, result)
        except Done:
            logging.getLogger().debug("Writer process exiting normally")
        except Killed:
            logging.getLogger().debug("Writer process exited early")
        except Exception:
            logging.getLogger().error(
                "Unexpected error in writer process", exc_info=True
            )
            self.control.set_value(CONTROL_ERROR)
        finally:
            num_batches = self.control.get_value(lock=True)
            self.result_handler.finish(num_batches if num_batches > 0 else None)


class WriterManager:
    """Owns the writer process and its control variable."""

    def __init__(self, writers, compression, preserve_order, result_queue, timeout):
        from atropos_tpu.commands.trim import WriterResultHandler

        if preserve_order:
            writer_result_handler = OrderPreservingWriterResultHandler(
                writers, compressed=compression == "worker"
            )
        else:
            writer_result_handler = WriterResultHandler(
                writers, compressed=compression == "worker"
            )

        self.timeout = timeout
        self.writer_control = Control(CONTROL_ACTIVE)
        self.writer_process = ResultProcess(
            writer_result_handler, result_queue, self.writer_control, timeout
        )
        self.writer_process.start()

    def is_active(self):
        return self.writer_process.is_alive() and self.writer_control.check_value(
            CONTROL_ACTIVE
        )

    def set_num_batches(self, num_batches):
        self.writer_control.set_value(num_batches)

    def wait(self):
        wait_on_process(self.writer_process, self.timeout)

    def terminate(self, retcode):
        kill(self.writer_process, retcode, self.timeout)


def _make_order_preserving_handler():
    """OrderPreservingWriterResultHandler requires the trim module's
    WriterResultHandler base; construct the class lazily to avoid an import
    cycle at module load."""
    from atropos_tpu.commands.trim import WriterResultHandler

    class _OrderPreserving(WriterResultHandler):
        """Writer handler that buffers out-of-order batches and flushes
        them sequentially."""

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.pending = None
            self.cur_batch = None

        def start(self, worker=None):
            super().start(worker)
            self.pending = PendingQueue()
            self.cur_batch = 1

        def write_result(self, batch_num, result):
            if batch_num == self.cur_batch:
                self.writers.write_result(result, self.compressed)
                self.cur_batch += 1
                self.consume_pending()
            else:
                self.pending.push(batch_num, result)

        def finish(self, total_batches=None):
            if total_batches is not None:
                self.consume_pending()
                if self.cur_batch != total_batches + 1:
                    raise MulticoreError(
                        "OrderPreservingWriterResultHandler finishing "
                        "without having seen {} of {} batches".format(
                            total_batches + 1 - self.cur_batch, total_batches
                        )
                    )
            super().finish(total_batches=total_batches)

        def consume_pending(self):
            while (not self.pending.empty) and (
                self.cur_batch == self.pending.min_priority
            ):
                self.writers.write_result(self.pending.pop(), self.compressed)
                self.cur_batch += 1

    return _OrderPreserving


def OrderPreservingWriterResultHandler(*args, **kwargs):
    return _make_order_preserving_handler()(*args, **kwargs)


def run_parallel_trim(command_runner, record_handler, writers):
    """Parallel trim orchestration (reference ``trim/__init__.py:692``):
    sets up worker/writer compression placement, the writer process (or
    parallel-write mode), and runs the ParallelTrimPipelineRunner."""
    from multiprocessing import Manager

    from atropos_tpu.commands.trim import (
        PairedEndTrimPipeline,
        SingleEndTrimPipeline,
        TrimPipeline,
        WorkerResultHandler,
        WriterResultHandler,
    )
    from atropos_tpu.io.compression import can_use_system_compression

    options = command_runner.options
    timeout = max(command_runner.process_timeout, RETRY_INTERVAL)
    threads = command_runner.threads

    logging.getLogger().debug(
        "Starting trim in parallel mode with threads=%d, timeout=%d",
        threads,
        timeout,
    )

    if threads < 2:
        raise ValueError("'threads' must be >= 2")

    compression = command_runner.compression
    if compression is None:
        compression = "worker"
        if command_runner.writer_process and can_use_system_compression():
            compression = "writer"
    if compression == "writer" and threads > 2:
        threads -= 1

    queue_manager = Manager()
    result_queue = queue_manager.Queue(options.result_queue_size)
    writer_manager = None

    if options.writer_process:
        if compression == "writer":
            worker_result_handler = WorkerResultHandler(
                QueueResultHandler(result_queue)
            )
        else:
            worker_result_handler = CompressingWorkerResultHandler(
                QueueResultHandler(result_queue)
            )
        writer_manager = WriterManager(
            writers, compression, options.preserve_order, result_queue, timeout
        )
    else:
        worker_result_handler = WorkerResultHandler(
            WriterResultHandler(writers, use_suffix=True)
        )

    if options.paired:
        base = PairedEndTrimPipeline
    else:
        base = SingleEndTrimPipeline
    pipeline_class = type(
        "ParallelTrimPipelineImpl", (ParallelPipelineMixin, base), {}
    )
    pipeline = pipeline_class(record_handler, worker_result_handler)
    runner = ParallelTrimPipelineRunner(
        command_runner, pipeline, threads, writer_manager, queue_manager
    )
    return runner.run()


# -- primitives -------------------------------------------------------------


def launch_workers(num_workers, args=(), offset=0, worker_class=WorkerProcess):
    logging.getLogger().info("Starting %d worker processes", num_workers)
    workers = [worker_class(i + offset, *args) for i in range(num_workers)]
    for worker in workers:
        worker.start()
    return workers


def ensure_processes(processes, message="One or more process exited: {}", alive=True):
    is_alive = [worker.is_alive() for worker in processes]
    if alive != all(is_alive):
        raise MulticoreError(
            message.format(
                ",".join(str(i) for i, a in enumerate(is_alive) if a != alive)
            )
        )


def wait_on(
    condition,
    *args,
    wait_message="Waiting {}",
    timeout=None,
    fail_callback=None,
    wait=None,
    timeout_callback=None,
):
    """Poll ``condition`` until it returns non-False; soft timeout escalates
    log level rather than killing (reference rationale:
    ``trim/__init__.py:719-742``)."""
    if wait is True:
        wait = lambda: time.sleep(RETRY_INTERVAL)
    elif isinstance(wait, int):
        wait_time = wait
        wait = lambda: time.sleep(wait_time)
    wait_start = None
    while True:
        result = condition(*args)
        if result is not False:
            return result
        if fail_callback:
            fail_callback()
        now = time.time()
        if not wait_start:
            wait_start = now
        else:
            waiting = now - wait_start
            msg = wait_message.format("for {} seconds".format(round(waiting, 1)))
            if timeout is not None and waiting >= timeout:
                logging.getLogger().error(msg)
                if timeout_callback:
                    if inspect.isclass(timeout_callback):
                        raise timeout_callback()
                    else:
                        timeout_callback()
            else:
                logging.getLogger().debug(msg)
            if wait:
                wait()


def wait_on_process(process, timeout, terminate=False):
    timeout_callback = lambda: process.terminate() if terminate else None
    return wait_on(
        lambda: not process.is_alive(),
        wait_message="Waiting on {} to terminate {{}}".format(process.name),
        timeout=timeout,
        wait=lambda: process.join(RETRY_INTERVAL),
        timeout_callback=timeout_callback,
    )


def enqueue(
    queue,
    item,
    wait_message="Waiting to enqueue item {}",
    block_timeout=RETRY_INTERVAL,
    **kwargs,
):
    def condition(item):
        try:
            queue.put(item, block=True, timeout=block_timeout)
            return True
        except Full:
            return False

    wait_on(condition, item, wait_message=wait_message, **kwargs)


def enqueue_all(iterable, queue, timeout, fail_callback):
    num_items = 0

    def condition(item):
        try:
            queue.put(item, block=True, timeout=RETRY_INTERVAL)
            return True
        except Full:
            return False

    for item in iterable:
        wait_on(
            condition,
            item,
            wait_message="Main process waiting to queue item {}",
            timeout=timeout,
            fail_callback=fail_callback,
        )
        num_items += 1
    return num_items


def dequeue(
    queue,
    wait_message="Waiting to dequeue item {}",
    block_timeout=RETRY_INTERVAL,
    **kwargs,
):
    def condition():
        try:
            return queue.get(block=True, timeout=block_timeout)
        except Empty:
            return False

    return wait_on(condition, wait_message=wait_message, **kwargs)


def kill(process, retcode, timeout):
    if retcode <= 1:
        wait_on_process(process, timeout, terminate=True)
    elif process.is_alive():
        process.terminate()
