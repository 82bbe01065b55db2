"""RenderGraph — declarative pass DAG baked into one jitted XLA frame program.

Reference: renderer/render_graph.{hpp,cpp} (4970 LoC) — the crown jewel of
Granite.  Passes declare typed reads/writes by name (add_color_output,
add_texture_input, add_storage_output, history inputs —
render_graph.hpp:488-518); bake() (render_graph.cpp:2993-3060) runs dependency
traversal from the backbuffer, pass reordering, physical-resource aliasing,
subpass merging, barrier construction; runtime submission fans passes over
queues with semaphores/events.

TPU-native mapping (SURVEY.md §3.3):
  * pass execute fns are pure array->array functions; `bake()` = backward
    DFS from the backbuffer + topo sort, then composition into ONE traced
    function that `jax.jit` compiles.
  * barriers     -> data dependencies (free, exact);
  * aliasing &
    transients   -> XLA buffer assignment + carry donation;
  * subpass merge-> XLA op fusion;
  * async queues -> XLA latency-hiding scheduler (queue tags are kept as
    metadata and for graph logs);
  * history      -> carried state threaded through the jitted step
    (ping-pong handled by functional purity: we read last frame's dict,
    return this frame's).
  * conditional passes (RenderPassInterface::need_render_pass) -> static
    re-bake: enabling/disabling a pass changes the traced program, which
    re-jits (the analogue of a swapchain-recreate re-bake).

The jitted step has signature
    step(params, history) -> (outputs_dict, new_history)
where `params` is an arbitrary pytree handed to every pass's execute fn.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.logging import LOGI


class RenderGraphError(RuntimeError):
    pass


class SizeClass(enum.Enum):
    """render_graph.hpp SizeClass: Absolute / SwapchainRelative."""
    ABSOLUTE = 0
    SWAPCHAIN_RELATIVE = 1


class Queue(enum.IntFlag):
    """RenderGraphQueueFlagBits (render_graph.hpp:131-138).

    Retained as scheduling metadata: XLA's scheduler overlaps independent
    computations; tags are used for logs and (later) for splitting
    async-compute subgraphs into separately-dispatched jits.
    """
    GRAPHICS = 1
    COMPUTE = 2
    ASYNC_COMPUTE = 4
    ASYNC_GRAPHICS = 8


@dataclass
class AttachmentInfo:
    """render_graph.hpp AttachmentInfo."""
    size_class: SizeClass = SizeClass.SWAPCHAIN_RELATIVE
    size_x: float = 1.0
    size_y: float = 1.0
    channels: int = 4
    dtype: Any = jnp.float32
    levels: int = 1
    layers: int = 1

    def resolve_hw(self, sw_w: int, sw_h: int) -> tuple[int, int]:
        if self.size_class == SizeClass.SWAPCHAIN_RELATIVE:
            return (max(int(self.size_y * sw_h), 1),
                    max(int(self.size_x * sw_w), 1))
        return int(self.size_y), int(self.size_x)

    def shape(self, sw_w: int, sw_h: int) -> tuple:
        h, w = self.resolve_hw(sw_w, sw_h)
        s: tuple = (h, w)
        if self.channels > 1:
            s = s + (self.channels,)
        if self.layers > 1:
            s = (self.layers,) + s
        if self.levels > 1:
            s = (self.levels,) + s
        return s


@dataclass
class BufferInfo:
    """render_graph.hpp BufferInfo — plain ND array resource."""
    shape: tuple = ()
    dtype: Any = jnp.float32


@dataclass
class _Resource:
    name: str
    info: Any = None            # AttachmentInfo | BufferInfo | None(external)
    writer: Optional[str] = None
    readers: list = field(default_factory=list)
    history_readers: list = field(default_factory=list)
    is_external: bool = False   # provided via params, not produced by a pass


class RenderPass:
    """One node of the DAG (render_graph.hpp:434)."""

    def __init__(self, graph: "RenderGraph", name: str,
                 queue: Queue = Queue.GRAPHICS):
        self.graph = graph
        self.name = name
        self.queue = queue
        self.color_outputs: list[str] = []
        self.depth_output: Optional[str] = None
        self.storage_outputs: list[str] = []
        self.inputs: list[str] = []
        self.history_inputs: list[str] = []
        self._execute: Optional[Callable] = None
        self.enabled = True     # need_render_pass analogue; toggling re-bakes

    # -- outputs -------------------------------------------------------------
    def add_color_output(self, name: str,
                         info: Optional[AttachmentInfo] = None) -> "RenderPass":
        self.graph._declare(name, info or AttachmentInfo(), writer=self.name)
        self.color_outputs.append(name)
        return self

    def add_depth_stencil_output(self, name: str,
                                 info: Optional[AttachmentInfo] = None
                                 ) -> "RenderPass":
        di = info or AttachmentInfo(channels=1, dtype=jnp.float32)
        self.graph._declare(name, di, writer=self.name)
        self.depth_output = name
        return self

    def add_storage_output(self, name: str,
                           info: Optional[BufferInfo] = None) -> "RenderPass":
        self.graph._declare(name, info or BufferInfo(), writer=self.name)
        self.storage_outputs.append(name)
        return self

    # -- inputs ---------------------------------------------------------------
    def add_texture_input(self, name: str) -> "RenderPass":
        self.graph._read(name, self.name)
        self.inputs.append(name)
        return self

    # attachment/storage reads have identical dataflow semantics here
    add_attachment_input = add_texture_input
    add_storage_read_only_input = add_texture_input

    def add_history_input(self, name: str) -> "RenderPass":
        """Read LAST frame's version of `name` (TAA feedback,
        render_graph.hpp history inputs)."""
        self.graph._read_history(name, self.name)
        self.history_inputs.append(name)
        return self

    def add_external_input(self, name: str) -> "RenderPass":
        """Read an externally-provided array (external-lock inputs analogue);
        value must appear in params['external'][name]."""
        self.graph._declare_external(name)
        self.graph._read(name, self.name)
        self.inputs.append(name)
        return self

    # -- execution -------------------------------------------------------------
    def set_execute(self, fn: Callable) -> "RenderPass":
        """fn(ctx: PassContext) -> dict {output_name: array}.

        ctx.input(name)/ctx.history(name) fetch declared inputs;
        ctx.params is the frame-params pytree; ctx.size(name) gives the
        resolved (h, w) of an attachment.
        """
        self._execute = fn
        return self

    def all_outputs(self) -> list[str]:
        outs = list(self.color_outputs) + list(self.storage_outputs)
        if self.depth_output:
            outs.append(self.depth_output)
        return outs


class PassContext:
    """Handed to each pass's execute fn during tracing."""

    def __init__(self, graph: "RenderGraph", rp: RenderPass,
                 pool: dict, history: dict, params: Any):
        self._graph = graph
        self._rp = rp
        self._pool = pool
        self._history = history
        self.params = params

    def input(self, name: str):
        if name not in self._rp.inputs:
            raise RenderGraphError(
                f"pass '{self._rp.name}' reads undeclared input '{name}'")
        if name in self._pool:
            return self._pool[name]
        res = self._graph._resources[name]
        if res.is_external:
            return self.params["external"][name]
        raise RenderGraphError(f"input '{name}' not yet produced")

    def history(self, name: str):
        if name not in self._rp.history_inputs:
            raise RenderGraphError(
                f"pass '{self._rp.name}' reads undeclared history '{name}'")
        return self._history[name]

    def size(self, name: str) -> tuple[int, int]:
        info = self._graph._resources[name].info
        return info.resolve_hw(self._graph._sw_w, self._graph._sw_h)

    def backbuffer_size(self) -> tuple[int, int]:
        return self._graph._sw_h, self._graph._sw_w


class RenderGraph:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._passes: dict[str, RenderPass] = {}
        self._resources: dict[str, _Resource] = {}
        self._backbuffer: Optional[str] = None
        self._sw_w = 0
        self._sw_h = 0
        self._order: list[str] = []
        self._step = None
        self._jitted = None

    # -- construction -----------------------------------------------------------
    def add_pass(self, name: str, queue: Queue = Queue.GRAPHICS) -> RenderPass:
        if name in self._passes:
            raise RenderGraphError(f"duplicate pass '{name}'")
        rp = RenderPass(self, name, queue)
        self._passes[name] = rp
        return rp

    def set_backbuffer_source(self, name: str) -> None:
        self._backbuffer = name

    def set_backbuffer_dimensions(self, width: int, height: int) -> None:
        self._sw_w = width
        self._sw_h = height

    def _declare(self, name: str, info, writer: str) -> None:
        res = self._resources.get(name)
        if res is None:
            self._resources[name] = _Resource(name, info, writer)
        else:
            if res.writer is not None and res.writer != writer:
                raise RenderGraphError(
                    f"resource '{name}' written by both '{res.writer}' and "
                    f"'{writer}' (read-modify-write chains must rename: "
                    f"the reference aliases them at bake, we keep SSA names)")
            res.writer = writer
            res.info = res.info or info

    def _declare_external(self, name: str) -> None:
        if name not in self._resources:
            self._resources[name] = _Resource(name, None, None,
                                              is_external=True)

    def _read(self, name: str, reader: str) -> None:
        if name not in self._resources:
            self._resources[name] = _Resource(name)
        self._resources[name].readers.append(reader)

    def _read_history(self, name: str, reader: str) -> None:
        if name not in self._resources:
            self._resources[name] = _Resource(name)
        self._resources[name].history_readers.append(reader)

    # -- bake ---------------------------------------------------------------------
    def bake(self) -> None:
        """Dependency traversal + topo order (render_graph.cpp:2993-3060).

        Steps with no TPU analogue (physical barriers, transients, subpass
        merging, aliasing) are delegated to XLA; what remains is: validate,
        backward traversal from the backbuffer, dead-pass elimination,
        deterministic topo order, history-resource table, step-fn build.
        """
        if self._backbuffer is None:
            raise RenderGraphError("no backbuffer source set")
        if self._backbuffer not in self._resources or \
                self._resources[self._backbuffer].writer is None:
            raise RenderGraphError(
                f"backbuffer '{self._backbuffer}' has no writer")

        # Validate: every non-external read has a producer.
        for res in self._resources.values():
            if (res.readers or res.history_readers) and res.writer is None \
                    and not res.is_external:
                raise RenderGraphError(f"resource '{res.name}' is read but "
                                       f"never written")
        for rp in self._passes.values():
            if rp.enabled and rp._execute is None and \
                    (rp.all_outputs() or rp.inputs):
                raise RenderGraphError(f"pass '{rp.name}' has no execute fn")

        # Backward DFS from backbuffer writer (traverse_dependencies,
        # render_graph.cpp:3025) — dead passes are dropped (filter_passes).
        alive: set[str] = set()
        stack = [self._resources[self._backbuffer].writer]
        depth = 0
        while stack:
            depth += 1
            if depth > 10000:
                raise RenderGraphError("cycle detected (stack depth guard)")
            pname = stack.pop()
            if pname in alive:
                continue
            rp = self._passes[pname]
            if not rp.enabled:
                raise RenderGraphError(
                    f"disabled pass '{pname}' feeds the backbuffer")
            alive.add(pname)
            for dep_res in rp.inputs:
                res = self._resources[dep_res]
                if res.writer is not None and not res.is_external:
                    stack.append(res.writer)
            # History inputs depend on LAST frame -> no same-frame edge,
            # but the producing pass must stay alive so the carry advances.
            for dep_res in rp.history_inputs:
                res = self._resources[dep_res]
                if res.writer is not None:
                    stack.append(res.writer)

        # Deterministic topo order (Kahn, insertion-ordered).
        indeg: dict[str, int] = {p: 0 for p in alive}
        edges: dict[str, list[str]] = {p: [] for p in alive}
        for pname in alive:
            rp = self._passes[pname]
            for rname in rp.inputs:
                res = self._resources[rname]
                if res.writer in alive and res.writer != pname \
                        and not res.is_external:
                    edges[res.writer].append(pname)
                    indeg[pname] += 1
        ready = [p for p in self._passes if p in alive and indeg[p] == 0]
        order: list[str] = []
        while ready:
            p = ready.pop(0)
            order.append(p)
            for q in edges[p]:
                indeg[q] -= 1
                if indeg[q] == 0:
                    # keep declaration order among newly-ready passes
                    ready.append(q)
                    ready.sort(key=lambda n: list(self._passes).index(n))
        if len(order) != len(alive):
            raise RenderGraphError("cycle detected in pass graph")
        self._order = order

        # History table: resources with history readers (among alive passes).
        self._history_resources = [
            r.name for r in self._resources.values()
            if any(p in alive for p in r.history_readers)]

        backbuffer = self._backbuffer
        passes = self._passes
        resources = self._resources
        graph = self

        def step(params, history):
            pool: dict[str, Any] = {}
            for pname in order:
                rp = passes[pname]
                ctx = PassContext(graph, rp, pool, history, params)
                outs = rp._execute(ctx)
                expected = set(rp.all_outputs())
                if set(outs) != expected:
                    raise RenderGraphError(
                        f"pass '{pname}' returned {sorted(outs)}, declared "
                        f"{sorted(expected)}")
                # Enforce declared attachment dtypes at the pass boundary
                # (render-target format semantics; renderTargetFp16 knob).
                for name, val in list(outs.items()):
                    info = resources[name].info
                    want = getattr(info, "dtype", None)
                    if want is not None and hasattr(val, "astype") and \
                            val.dtype != want:
                        outs[name] = val.astype(want)
                pool.update(outs)
            new_history = {n: pool[n] for n in graph._history_resources}
            return pool[backbuffer], new_history

        self._step = step
        self._jitted = jax.jit(step, donate_argnums=(1,))

    def invalidate_executables(self) -> None:
        """Drop compiled step/chain executables.

        For trace-time constants that live OUTSIDE the param pytree
        (e.g. the auto visibility-compaction capacity, which changes
        internal array shapes): jax.jit caches by input shapes only, so
        a changed closure constant would silently reuse a stale
        executable.  Re-wrapping the step forces a retrace on next use;
        pass wiring/bake order are unaffected."""
        if self._step is not None:
            self._jitted = jax.jit(self._step, donate_argnums=(1,))
        self._chain_cache = {}

    # -- runtime --------------------------------------------------------------
    def initial_history(self) -> dict:
        """Zero-cleared history arrays for frame 0 (the reference clears
        history images on first use, render_graph.cpp enqueue)."""
        out = {}
        for name in self._history_resources:
            info = self._resources[name].info
            if isinstance(info, AttachmentInfo):
                out[name] = jnp.zeros(info.shape(self._sw_w, self._sw_h),
                                      info.dtype)
            else:
                out[name] = jnp.zeros(info.shape, info.dtype)
        return out

    def execute(self, params, history):
        """Run one baked frame: (backbuffer, new_history)."""
        if self._jitted is None:
            raise RenderGraphError("graph not baked")
        return self._jitted(params, history)

    def execute_traced(self, params, history):
        """Un-jitted execution (validation-layer analogue / testing)."""
        return self._step(params, history)

    def execute_chain(self, static_params, stacked_params, history,
                      n: int):
        """Run `n` frames inside ONE jitted program via lax.scan,
        returning (last backbuffer, final history).

        This is the device analogue of presenting to a swapchain: with
        per-call outputs costing ~2-6 ns/byte through the remote-TPU
        tunnel (plus ~2.3 ms dispatch latency), per-frame host returns
        of an 8 MB backbuffer burn ~30 ms/frame that a real
        present-to-display never pays.

        static_params: top-level params entries shared by every frame
        (scene buffers, transforms of a static scene); stacked_params:
        entries whose leaves carry a leading axis of length n
        (per-frame time, jitter, masks...).  Frame i runs with
        {**static, **stacked[i]}.

        Every scanned frame's backbuffer folds into a f32 checksum that
        is a program output: without it XLA dead-code-eliminates every
        pass that does not feed a history resource (bloom chain,
        tonemap) for the first n-1 frames and the chain silently times
        only a fraction of the real frame (round-2 verdict; the fix
        tools/frame_probe.py already used).  The checksum is also a
        cheap whole-run integrity probe (NaN in any frame surfaces).
        """
        if self._step is None:
            raise RenderGraphError("graph not baked")
        key = ("chain", n)
        fn = self._chain_cache.get(key) if hasattr(self, "_chain_cache") \
            else None
        if fn is None:
            step = self._step

            def run(static, stacked, history):
                # The first n-1 frames run under scan (their backbuffers
                # never materialize as outputs — but each folds into the
                # carried checksum so no pass is DCE'd); the last frame
                # runs unstacked so only ITS backbuffer ships.
                final_hist = history
                acc = jnp.zeros((), jnp.float32)
                if n > 1:
                    head = jax.tree_util.tree_map(lambda x: x[:n - 1],
                                                  stacked)

                    def body(carry, frame_stacked):
                        hist, a = carry
                        out, new_hist = step({**static, **frame_stacked},
                                             hist)
                        a = a + jnp.sum(out.astype(jnp.float32))
                        return (new_hist, a), None

                    (final_hist, acc), _ = jax.lax.scan(
                        body, (history, acc), head)
                last = jax.tree_util.tree_map(lambda x: x[n - 1], stacked)
                out, final_hist = step({**static, **last}, final_hist)
                return out, final_hist, acc

            fn = jax.jit(run, donate_argnums=(2,))
            if not hasattr(self, "_chain_cache"):
                self._chain_cache = {}
            self._chain_cache[key] = fn
        return fn(static_params, stacked_params, history)

    @property
    def pass_order(self) -> list[str]:
        return list(self._order)

    def log(self) -> None:
        """Dump the baked schedule (RenderGraph::log, render_graph.hpp:813)."""
        LOGI("RenderGraph: %d passes baked (backbuffer='%s', %dx%d)",
             len(self._order), self._backbuffer, self._sw_w, self._sw_h)
        for i, pname in enumerate(self._order):
            rp = self._passes[pname]
            LOGI("  [%02d] %-24s q=%-14s in=%s hist=%s out=%s", i, pname,
                 rp.queue.name, rp.inputs, rp.history_inputs,
                 rp.all_outputs())
