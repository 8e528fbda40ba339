"""Continuous-batching serving runtime (beyond-reference component).

The reference serves one request at a time through a Gradio callback
(app.py:205-246 — each click runs the full inferencer synchronously). On a
TPU chip that wastes most of the duty cycle: decode is bandwidth-bound, so
batching B understanding sessions costs nearly the same per step as one.

This runtime keeps a slot-batched KV cache `[L, slots, max_kv, KH, D]` and a
scheduler thread that:

- admits queued chat (understanding) requests into free slots: per-row-valid
  prefill writes each new conversation into its own cache rows while other
  rows carry live sessions untouched (the same ragged-batch machinery as
  engine.chat_batch);
- decodes all active slots together in fixed-size chunks through the jitted
  `decode_text(active=...)` loop — one device roundtrip per chunk, not per
  token, which matters on high-latency links;
- retires rows that emit EOS or exhaust their budget and immediately refills
  the slots from the queue (continuous batching a la Orca/vLLM, re-designed
  around static-shape XLA loops: the batch shape never changes, liveness is
  data);
- interleaves image-generation jobs (T2I / edit, whole denoise runs) between
  decode chunks so mixed und/gen traffic shares the chip fairly.

Usage:
    rt = ServingRuntime(engine, slots=4, decode_chunk=16)
    rt.start()
    fut = rt.submit_chat("what is in this image?", image=arr)
    ans = fut.result()
    img = rt.submit_generate("a red bicycle", image_shapes=(512, 512)).result()
    rt.stop()
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
from functools import partial
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from bagel_tpu.inference.engine import _bucket, _extend_jit, gen_batch_key
from bagel_tpu.models import qwen2
from bagel_tpu.models.bagel import encode_vit_tokens
from bagel_tpu.models.qwen2 import KVCache, kv_cache_init


class Future:
    """Minimal blocking future (no concurrent.futures executor semantics)."""

    def __init__(self):
        self._evt = threading.Event()
        self._result = None
        self._error: Optional[BaseException] = None

    def set_result(self, value):
        self._result = value
        self._evt.set()

    def set_error(self, err: BaseException):
        self._error = err
        self._evt.set()

    def done(self) -> bool:
        return self._evt.is_set()

    def result(self, timeout: Optional[float] = None):
        if not self._evt.wait(timeout):
            raise TimeoutError("request not finished")
        if self._error is not None:
            raise self._error
        return self._result


class _Defer(Exception):
    """Admission must wait for capacity (live sessions too near max_kv)."""


@dataclasses.dataclass
class _ChatRequest:
    prompt: str
    image: Optional[np.ndarray]
    max_new_tokens: int
    future: Future
    # optional streaming hook: called from the scheduler thread with the
    # token ids produced by each decode chunk (may be empty on the final
    # flush). Keep it fast — it blocks the decode loop.
    on_tokens: Optional[Callable[[List[int]], None]] = None


@dataclasses.dataclass
class _GenRequest:
    kwargs: dict
    future: Future


@dataclasses.dataclass
class _Slot:
    req: _ChatRequest
    next_token: int  # decode input token for the next chunk
    next_pos: int  # its rope position
    produced: List[int] = dataclasses.field(default_factory=list)


@partial(jax.jit, static_argnames=("cfg", "max_steps", "eos_id"),
         donate_argnames=("cache",))
def _decode_chunk_jit(params, cfg, cache, start, pos, active, *, max_steps,
                      eos_id):
    """Cache donated: the scheduler replaces self.cache with the returned
    one right away, and aliasing lets XLA run the decode loop in the same
    HBM buffer (no per-chunk copy of the [L, slots, S, KH, D] cache, no 2x
    peak while the chunk runs)."""
    return qwen2.decode_text(
        params["llm"], cfg.llm, cache, start, pos,
        max_steps=max_steps, eos_id=eos_id, active=active,
    )


@partial(jax.jit,
         static_argnames=("cfg", "max_steps", "eos_id", "draft_len", "ngram"),
         donate_argnames=("cache",))
def _decode_spec_chunk_jit(params, cfg, cache, start, pos, active, hist,
                           hist_len, *, max_steps, eos_id, draft_len, ngram):
    """Speculative chunk: same contract as _decode_chunk_jit (continuing
    rows consume exactly max_steps tokens — decode_text_spec caps emission
    at the budget), but each forward verifies draft_len prompt-lookup
    tokens, so repetitive completions finish in far fewer weight passes."""
    from bagel_tpu.inference.speculative import decode_text_spec

    return decode_text_spec(
        params["llm"], cfg.llm, cache, start, pos, hist, hist_len,
        max_steps=max_steps, eos_id=eos_id, draft_len=draft_len,
        ngram=ngram, active=active,
    )


class ServingRuntime:
    def __init__(
        self,
        engine,
        slots: int = 4,
        decode_chunk: int = 16,
        max_new_default: int = 256,
        mesh=None,
        speculative: int = 0,
        ngram: int = 3,
        gen_batch: int = 1,
    ):
        """mesh: optional jax.sharding.Mesh (dp, fsdp, tp). When given, the
        slot-batched KV cache is created sharded — slots over dp, KV heads
        over tp (each axis only when divisible) — so a 14B engine whose
        weights are GSPMD-sharded over v5e-8 (app.py --mesh) serves
        continuous batches without replicating the cache per chip. The
        scheduler remains a single controller: in a multi-process
        deployment requests enter at process 0 and the per-iteration jitted
        calls are identical on every process (GSPMD single-program model).
        """
        self.engine = engine
        self.slots = slots
        self.decode_chunk = decode_chunk
        self.max_new_default = max_new_default
        self.mesh = mesh
        # speculative=K: prompt-lookup speculative decode inside every
        # chunk (inference/speculative.py) — per-slot token histories are
        # the lookup corpus; greedy-exact, so served text is unchanged
        self.speculative = speculative
        self.ngram = ngram
        # gen_batch=B: up to B queued T2I jobs sharing one gen_batch_key
        # (same shape/CFG schedule, no input image/think) run as ONE batched
        # denoise scan (engine.generate_batch) instead of serially.
        # HBM bound (measured, NOTES r4): J=2 at 1024px full-depth w8a8
        # OOMs a single 16 GB v5e (the 2*3-branch gate_up activation tile
        # alone is 1.7 GB on top of 13.7 GB of weights+caches) — use >1
        # only for <=512-768px shapes or weight-sharded (--mesh) serving.
        self.gen_batch = gen_batch
        self.hist = np.zeros((slots, engine.max_kv), np.int32)
        self.hist_len = np.zeros(slots, np.int32)
        self.cache: KVCache = self._new_cache()
        self.slot_state: List[Optional[_Slot]] = [None] * slots
        self.chat_q: "queue.Queue[_ChatRequest]" = queue.Queue()
        self.gen_q: "queue.Queue[_GenRequest]" = queue.Queue()
        # scheduler-private overflow of drained-but-unscheduled gen jobs
        # (only the scheduler thread touches it)
        self._gen_pending: "collections.deque[_GenRequest]" = collections.deque()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"chat_done": 0, "gen_done": 0, "chunks": 0,
                      "tokens_out": 0}

    def _new_cache(self) -> KVCache:
        """The one slot-cache constructor (init + post-error recovery): a
        divergence between the two sites would make recovery rebuild with
        the wrong dtype/sharding."""
        cache = kv_cache_init(
            self.engine.cfg.llm, self.slots, self.engine.max_kv,
            self.engine.kv_dtype,
        )
        return self._shard_cache(cache) if self.mesh is not None else cache

    def _shard_cache(self, cache: KVCache) -> KVCache:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        kh = self.engine.cfg.llm.num_key_value_heads
        slot_ax = "dp" if self.slots % max(axes.get("dp", 1), 1) == 0 else None
        kh_ax = "tp" if kh % max(axes.get("tp", 1), 1) == 0 else None
        kv_s = NamedSharding(self.mesh, P(None, slot_ax, None, kh_ax, None))
        sc_s = NamedSharding(self.mesh, P(None, slot_ax, None, kh_ax))
        len_s = NamedSharding(self.mesh, P(slot_ax))
        return KVCache(
            k=jax.device_put(cache.k, kv_s),
            v=jax.device_put(cache.v, kv_s),
            length=jax.device_put(cache.length, len_s),
            k_scale=(None if cache.k_scale is None
                     else jax.device_put(cache.k_scale, sc_s)),
            v_scale=(None if cache.v_scale is None
                     else jax.device_put(cache.v_scale, sc_s)),
        )

    # -- client API ----------------------------------------------------------

    def submit_chat(
        self, prompt: str, image: Optional[np.ndarray] = None,
        max_new_tokens: Optional[int] = None,
        on_tokens: Optional[Callable[[List[int]], None]] = None,
    ) -> Future:
        """Queue an understanding request. image: HWC float in [-1, 1]
        (already transform-resized), or None for text-only. on_tokens:
        streaming callback receiving each decode chunk's token ids."""
        fut = Future()
        self.chat_q.put(_ChatRequest(
            prompt, image, max_new_tokens or self.max_new_default, fut,
            on_tokens,
        ))
        self._wake.set()
        return fut

    def submit_generate(self, prompt: Optional[str] = None,
                        image: Optional[np.ndarray] = None, **kwargs) -> Future:
        """Queue a T2I / edit job (engine.__call__ kwargs)."""
        fut = Future()
        kw = dict(kwargs)
        if prompt is not None:
            kw["text"] = prompt
        if image is not None:
            kw["image"] = image
        self.gen_q.put(_GenRequest(kw, fut))
        self._wake.set()
        return fut

    def start(self):
        assert self._thread is None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 30.0):
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None

    # -- scheduler internals ---------------------------------------------------

    def _free_rows(self) -> List[int]:
        return [i for i, s in enumerate(self.slot_state) if s is None]

    def _recover_cache(self, err: BaseException):
        """After a failed donated call the old cache buffers may be deleted
        (extend/decode donate self.cache). Rebuild a fresh cache and fail
        every live session — their KV state is unrecoverable — so the
        scheduler thread survives and keeps serving new requests."""
        for i, s in enumerate(self.slot_state):
            if s is not None:
                self.slot_state[i] = None
                if not s.req.future.done():
                    s.req.future.set_error(err)
        self.cache = self._new_cache()

    def _retire(self, i: int):
        """Free a slot AND zero its cache length — a stale length would
        count against capacity checks and shift the next admit's writes."""
        self.slot_state[i] = None
        self.cache = dataclasses.replace(
            self.cache, length=self.cache.length.at[i].set(0)
        )

    def _request_widths(self, req: _ChatRequest):
        """([img_tokens...], text_tokens) the prefill will write for a
        request — must mirror _prefill_rows' patch/tokenize math exactly.
        Requests may carry a list of images (interleaved-chat shape)."""
        eng = self.engine
        imgs = req.image
        if imgs is None:
            imgs = []
        elif isinstance(imgs, np.ndarray):
            imgs = [imgs]
        img_ns = []
        for im in imgs:
            patch = eng.cfg.vit.patch_size
            img = eng._crop_to_multiple(im, patch)
            img_ns.append((img.shape[0] // patch) * (img.shape[1] // patch))
        text_n = len(eng.tokenizer.encode(req.prompt)) + 2
        return img_ns, text_n

    @staticmethod
    def _plan_blocks(widths):
        """Exact write plan for a batched admission group.

        Each image ROUND and the text stage pad to shared buckets, and
        every extend writes its padded block into EVERY row at that row's
        current length (only rows with valid>0 advance) — so the per-row
        capacity requirement is the high-water mark of length + stage
        bucket across all stages, with lengths advancing per stage.
        Returns (round_tbs, text_tb, per_row_need, max_tb)."""
        n_rounds = max((len(w[0]) for w in widths), default=0)
        lens = [0] * len(widths)
        need = [0] * len(widths)
        round_tbs = []
        for k in range(n_rounds):
            tb_k = _bucket(max(w[0][k] for w in widths if len(w[0]) > k) + 2)
            round_tbs.append(tb_k)
            for i, w in enumerate(widths):
                need[i] = max(need[i], lens[i] + tb_k)
                if len(w[0]) > k:
                    lens[i] += w[0][k] + 2
        text_tb = _bucket(max(w[1] for w in widths))
        for i, w in enumerate(widths):
            need[i] = max(need[i], lens[i] + text_tb)
        max_tb = max(round_tbs + [text_tb])
        return round_tbs, text_tb, need, max_tb

    def _group_fits(self, widths, max_kv: int) -> bool:
        _, _, need, _ = self._plan_blocks(widths)
        return max(need) <= max_kv

    def _admit(self):
        """Move queued chat requests into free slots (one batched prefill).

        Greedy group building with a sequential-capacity check per candidate:
        a request joins the group only while every member still fits its
        image-block-then-text-block writes inside max_kv under the group's
        shared padded widths (the blocks are written sequentially, so the
        per-row requirement is image_len + text_bucket — taking the max of
        the two blocks would admit requests whose text write then clamps
        into, and corrupts, their own image KV)."""
        free = self._free_rows()
        rows, reqs, widths = [], [], []
        while free and not self.chat_q.empty():
            try:
                req = self.chat_q.get_nowait()
            except queue.Empty:
                break
            w = self._request_widths(req)
            if not self._group_fits([w], self.engine.max_kv):
                need = self._plan_blocks([w])[2][0]
                req.future.set_error(ValueError(
                    f"request needs {need} KV tokens but the buffer holds "
                    f"{self.engine.max_kv}; raise max_kv"
                ))
                continue
            if not self._group_fits(widths + [w], self.engine.max_kv):
                self.chat_q.put(req)  # fits alone; admit in a later group
                break
            rows.append(free.pop(0))
            reqs.append(req)
            widths.append(w)
        if not rows:
            return
        try:
            self._prefill_rows(rows, reqs, widths)
        except _Defer:
            # a live session is too close to max_kv for the padded prefill
            # block: requeue and admit once it retires
            for req in reqs:
                self.chat_q.put(req)
        except Exception as e:  # bad request must not kill the scheduler
            for r, req in zip(rows, reqs):
                self.slot_state[r] = None
                req.future.set_error(e)
            if getattr(self.cache.k, "is_deleted", lambda: False)():
                self._recover_cache(e)  # donated call failed mid-flight

    def _prefill_rows(self, rows: List[int], reqs: List[_ChatRequest],
                      widths: Optional[list] = None):
        eng = self.engine
        cfg = eng.cfg
        b = self.slots

        # live-row pre-check BEFORE touching the cache: llm_extend writes its
        # padded tb-block into EVERY row at that row's current length (only
        # the length advance is gated by q_valid), and dynamic_update_slice
        # clamps out-of-range starts — which would silently overwrite a live
        # session's KV tail. Defer admission while any live row is too close
        # to the buffer end for either block write.
        if widths is None:
            widths = [self._request_widths(r) for r in reqs]
        _, _, _, max_tb = self._plan_blocks(widths)
        lengths = np.asarray(self.cache.length)
        live_max = max(
            (int(lengths[i]) for i, s in enumerate(self.slot_state)
             if s is not None and i not in rows),
            default=0,
        )
        if live_max + max_tb > eng.max_kv:
            raise _Defer()

        # reset the admitted rows' cache lengths (their KV rows are dead)
        length = self.cache.length
        for i in rows:
            length = length.at[i].set(0)
        self.cache = dataclasses.replace(self.cache, length=length)
        rope = {i: 0 for i in rows}

        # --- image blocks: [start, end, vit tokens..., pad], one batched
        # extend per image ROUND (requests may carry image lists —
        # interleaved-chat shape; each image advances its row's rope by 1)
        row_imgs = {}
        for i, req in zip(rows, reqs):
            imgs = req.image
            if imgs is None:
                imgs = []
            elif isinstance(imgs, np.ndarray):
                imgs = [imgs]
            row_imgs[i] = imgs
        max_rounds = max((len(v) for v in row_imgs.values()), default=0)
        if max_rounds:
            patch = cfg.vit.patch_size
            boundary = eng._boundary_ids()
            per_img, all_p, all_pos, all_seg = {}, [], [], []
            off = seg = 0
            for i in rows:
                for k, im in enumerate(row_imgs[i]):
                    seg += 1
                    img = eng._crop_to_multiple(im, patch)
                    patches, pos, _, _ = eng._prep_image_tokens(
                        img, patch, cfg.vit_max_num_patch_per_side
                    )
                    per_img[(i, k)] = (off, patches.shape[0])
                    off += patches.shape[0]
                    all_p.append(patches)
                    all_pos.append(pos)
                    all_seg.append(np.full(patches.shape[0], seg, np.int32))
            flat = np.concatenate(all_p, 0)
            nb = _bucket(flat.shape[0], 64)
            packed = np.zeros((nb, flat.shape[1]), np.float32)
            packed[: flat.shape[0]] = flat
            pos_p = np.zeros(nb, np.int32)
            pos_p[: flat.shape[0]] = np.concatenate(all_pos, 0)
            seg_p = np.zeros(nb, np.int32)
            seg_p[: flat.shape[0]] = np.concatenate(all_seg, 0)
            vit_emb = encode_vit_tokens(
                eng.params, cfg, jnp.asarray(packed, eng.cache_dtype),
                jnp.asarray(pos_p), jnp.asarray(seg_p),
            )
            tok_emb = qwen2.embed_tokens(eng.params["llm"], boundary)
            for k in range(max_rounds):
                rows_k = [i for i in rows if len(row_imgs[i]) > k]
                tb = _bucket(max(per_img[(i, k)][1] for i in rows_k) + 2)
                blocks = jnp.zeros((b, tb, vit_emb.shape[-1]), vit_emb.dtype)
                valid = np.zeros(b, np.int32)
                pos_round = np.zeros((b, tb), np.int32)
                for i in rows_k:
                    o, n = per_img[(i, k)]
                    blocks = blocks.at[i, : n + 2].set(jnp.concatenate(
                        [tok_emb, vit_emb[o : o + n]], axis=0
                    ))
                    valid[i] = n + 2
                    pos_round[i] = rope[i]
                _, self.cache = _extend_jit(
                    eng.params, cfg, self.cache, blocks,
                    jnp.asarray(pos_round), jnp.asarray(valid),
                    causal=False,
                )
                for i in rows_k:
                    rope[i] += 1

        # --- text blocks, causal ---------------------------------------------
        ids_list = {
            i: [eng.new_token_ids["bos_token_id"]]
            + eng.tokenizer.encode(req.prompt)
            + [eng.new_token_ids["eos_token_id"]]
            for i, req in zip(rows, reqs)
        }
        tb = _bucket(max(len(x) for x in ids_list.values()))
        ids = np.zeros((b, tb), np.int32)
        pos = np.zeros((b, tb), np.int32)
        valid = np.zeros(b, np.int32)
        for i, x in ids_list.items():
            ids[i, : len(x)] = x
            pos[i, : len(x)] = rope[i] + np.arange(len(x))
            valid[i] = len(x)
        embeds = qwen2.embed_tokens(eng.params["llm"], jnp.asarray(ids))
        _, self.cache = _extend_jit(
            eng.params, cfg, self.cache, embeds, jnp.asarray(pos),
            jnp.asarray(valid), causal=True,
        )
        for i, req in zip(rows, reqs):
            self.slot_state[i] = _Slot(
                req=req,
                next_token=eng.new_token_ids["bos_token_id"],
                next_pos=rope[i] + len(ids_list[i]),
            )
            # lookup corpus for speculative decode: the prompt's token ids
            # (emitted tokens are appended as chunks complete)
            self.hist[i, :] = 0
            n = min(len(ids_list[i]), self.hist.shape[1])
            self.hist[i, :n] = ids_list[i][:n]
            self.hist_len[i] = n

    def _decode_step(self):
        """One decode chunk over all active slots; retire finished rows."""
        eng = self.engine
        b = self.slots
        eos = eng.new_token_ids["eos_token_id"]
        # sessions whose next chunk could overflow their KV rows finish now
        # with what they have (instead of asserting and killing the
        # scheduler thread); dynamic_update_slice would clamp and corrupt
        lengths = np.asarray(self.cache.length)
        # speculative chunks transiently write draft_len+1 entries past the
        # consumed length before rolling back — include that in the margin
        margin = self.decode_chunk + (
            self.speculative + 1 if self.speculative > 0 else 0
        )
        for i, s in enumerate(self.slot_state):
            if s is not None and int(lengths[i]) + margin > eng.max_kv:
                # count before resolving the future: a client observing
                # completion must see its request in the stats
                self.stats["chat_done"] += 1
                self._retire(i)
                s.req.future.set_result(eng.tokenizer.decode(s.produced))

        start = np.full(b, eos, np.int32)
        pos = np.zeros(b, np.int32)
        active = np.zeros(b, bool)
        for i, s in enumerate(self.slot_state):
            if s is not None:
                start[i], pos[i], active[i] = s.next_token, s.next_pos, True
        if not active.any():
            return
        if self.speculative > 0:
            toks, self.cache = _decode_spec_chunk_jit(
                eng.params, eng.cfg, self.cache, jnp.asarray(start),
                jnp.asarray(pos), jnp.asarray(active),
                jnp.asarray(self.hist),
                jnp.asarray(self.hist_len),
                max_steps=self.decode_chunk, eos_id=eos,
                draft_len=self.speculative, ngram=self.ngram,
            )
        else:
            toks, self.cache = _decode_chunk_jit(
                eng.params, eng.cfg, self.cache, jnp.asarray(start),
                jnp.asarray(pos), jnp.asarray(active),
                max_steps=self.decode_chunk, eos_id=eos,
            )
        toks = np.asarray(toks)
        self.stats["chunks"] += 1
        for i, s in enumerate(self.slot_state):
            if s is None:
                continue
            row = toks[i].tolist()
            hit_eos = eos in row
            new = row[: row.index(eos)] if hit_eos else row
            budget = s.req.max_new_tokens - len(s.produced)
            emitted = new[:budget]
            s.produced.extend(emitted)
            self.stats["tokens_out"] += len(emitted)
            if s.req.on_tokens is not None and emitted:
                try:
                    s.req.on_tokens(emitted)
                except Exception:
                    pass  # a broken stream consumer must not kill decode
            if hit_eos or len(s.produced) >= s.req.max_new_tokens:
                self.stats["chat_done"] += 1
                self._retire(i)
                s.req.future.set_result(eng.tokenizer.decode(s.produced))
            else:
                if self.speculative > 0:
                    # consumed inputs this chunk = chunk start + all
                    # emitted except the still-pending last token
                    consumed = [start[i]] + new[:-1]
                    h = int(self.hist_len[i])
                    m = min(len(consumed), self.hist.shape[1] - h)
                    self.hist[i, h : h + m] = consumed[:m]
                    self.hist_len[i] = h + m
                s.next_token = new[-1]
                s.next_pos += self.decode_chunk

    def _run_gen_jobs(self):
        """Run the gen queue's head job — batched with up to gen_batch - 1
        later jobs that share its gen_batch_key (one denoise scan for all
        of them). Non-matching jobs keep their queue order in _gen_pending."""
        while True:
            try:
                self._gen_pending.append(self.gen_q.get_nowait())
            except queue.Empty:
                break
        if not self._gen_pending:
            return
        head = self._gen_pending.popleft()
        batch = [head]
        if self.gen_batch > 1:
            key = gen_batch_key(head.kwargs)
            if key is not None:
                kept = collections.deque()
                for r in self._gen_pending:
                    if (len(batch) < self.gen_batch
                            and gen_batch_key(r.kwargs) == key):
                        batch.append(r)
                    else:
                        kept.append(r)
                self._gen_pending = kept
        try:
            if len(batch) == 1:
                # exclusive jobs inherit the runtime's speculative setting
                # for their text decodes (think / understanding) unless the
                # request pinned its own
                if self.speculative > 0:
                    head.kwargs.setdefault("speculative", self.speculative)
                outs = [self.engine(**head.kwargs)]
            else:
                outs = self.engine.generate_batch([r.kwargs for r in batch])
            for r, out in zip(batch, outs):
                self.stats["gen_done"] += 1  # count before resolving
                r.future.set_result(out)
        except Exception as e:
            # one shared scan: a failure is indivisible across the batch
            for r in batch:
                if not r.future.done():
                    r.future.set_error(e)

    def _tick(self) -> bool:
        """One scheduler iteration: admit, decode one chunk, run at most one
        gen job. Returns whether any device work happened. Deterministic
        given (queue contents at entry, device outputs) — the property the
        multi-host frontend (serving/multihost.py) relies on to replay the
        identical tick sequence on every process."""
        self._admit()
        busy = any(s is not None for s in self.slot_state)
        if busy:
            try:
                self._decode_step()
            except Exception as e:
                # fail the affected sessions, keep the scheduler alive —
                # a hung daemon thread would strand every future forever.
                # The decode chunk donates the cache, so the old buffers
                # may be gone: rebuild instead of touching them.
                self._recover_cache(e)
        # fair interleave: at most one gen run (a batched scan counts as
        # one) between decode chunks
        if self._gen_pending or not self.gen_q.empty():
            self._run_gen_jobs()
            busy = True
        return busy

    def _drain(self):
        """Fail every queued/live request so clients don't hang on stop."""
        err = RuntimeError("runtime stopped")
        for i, s in enumerate(self.slot_state):
            if s is not None and not s.req.future.done():
                s.req.future.set_error(err)
                self.slot_state[i] = None
        while self._gen_pending:
            self._gen_pending.popleft().future.set_error(err)
        for q in (self.chat_q, self.gen_q):
            while True:
                try:
                    q.get_nowait().future.set_error(err)
                except queue.Empty:
                    break

    def _loop(self):
        while not self._stop.is_set():
            busy = self._tick()
            if not busy and self.chat_q.empty() and not self._gen_pending:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
        self._drain()
