"""Generation family — port of the reference decode math
(src/pipelines/generation_utils.rs) over a deterministic stand-in LM head.

What is ported at branch level (same pattern as qa.py: the backbone forward
is a stand-in, ALL pipeline math is the reference algorithm):

  - repetition penalty        enforce_repetition_penalty  (generation_utils.rs:476-507)
  - no-repeat-ngram bans      get_banned_tokens           (:509-553)
  - top-k / top-p filtering   top_k_top_p_filtering       (:555-620)
  - hamming diversity penalty run_hamming_diversity_penalty (:620-647)
  - forced BOS / forced EOS   prepare_scores_for_generation (:329-357)
  - greedy / sampling loop    generate_no_beam_search     (:822-1035)
  - beam search (+ groups)    generate_beam_search        (:1059-1550)
  - beam hypothesis mgmt      BeamHypotheses::{add,is_done} (:2260-2373)
  - config + validation       GenerateConfig              (:98-142 defaults :148-174,
                                                           validate :177-210)

Spark surface: the WHOLE autoregressive decode runs inside one mapInPandas
eval (SURVEY §2 #19: "Spark adds nothing per-token — keep whole decode
inside one UDF call"); the head is a per-worker singleton.

Sampling determinism: the reference samples with an unseeded torch
multinomial; in this engine sampling is seeded (``GenerateConfig.seed``) so
every query stays reproducible.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, replace

import numpy as np

PAD_ID, BOS_ID, EOS_ID = 0, 1, 2
SPECIALS = ("<pad>", "<bos>", "<eos>")
NEG_INF = float("-inf")


# --------------------------------------------------------------------------
# config (GenerateConfig, generation_utils.rs:98-142; defaults :148-174)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class GenerateConfig:
    min_length: int = 0
    max_length: int | None = 56
    do_sample: bool = True
    early_stopping: bool = True
    num_beams: int = 5
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.9
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    no_repeat_ngram_size: int = 3
    num_return_sequences: int = 1
    num_beam_groups: int | None = None
    diversity_penalty: float | None = None
    forced_bos_token_id: int | None = None
    bad_word_ids: tuple[tuple[int, ...], ...] | None = None
    seed: int = 42  # ours (see module docstring); not in the reference

    def validate(self) -> None:
        """Port of GenerateConfig::validate (generation_utils.rs:177-210)."""
        if not self.temperature > 0:
            raise ValueError("temperature must positive")
        if not (0.0 <= self.top_p <= 1.0):
            raise ValueError("top_p must be 0 and 1")
        if not self.repetition_penalty >= 1.0:
            raise ValueError("repetition_penalty must be greater than 1")
        if not self.length_penalty > 0:
            raise ValueError("length_penalty must be strictly greater than 0")
        if not self.num_return_sequences > 0:
            raise ValueError(
                "num_return_sequences must be strictly greater than 0")
        if not self.num_beams > 0:
            raise ValueError("num_beams must be strictly greater than 0")
        if not self.do_sample:
            if self.num_beams == 1:
                if self.num_return_sequences != 1:
                    raise ValueError("num_return_sequences must be set to 1 "
                                     "for greedy decoding")
            elif self.num_beams < self.num_return_sequences:
                raise ValueError("num_return_sequences must be lower than "
                                 "the number of beams")
        if self.num_beam_groups is not None and self.num_beam_groups > 1:
            if self.num_beams % self.num_beam_groups != 0:
                raise ValueError(
                    "num_beams must be divisible by num_beam_groups")


# --------------------------------------------------------------------------
# stand-in LM head (deterministic; same role as qa.py's stand-in encoder)
# --------------------------------------------------------------------------

def _hash01(*parts) -> float:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little") / 2**64


class StandInLMHead:
    """Deterministic next-token logits over a closed word vocab.

    Logit recipe (pure function of (seed, context, candidate, encoder)):
      - base: hash01(seed, last two context ids, candidate id) in [0, 1)
      - +2.0 for candidates present in the encoder input (enc-dec mode), so
        "summaries" draw from the source document,
      - EOS logit = 3 * (fraction of distinct in-vocab encoder words already
        generated) in enc-dec mode, or 0.35 + hash noise in causal mode, so
        sequences terminate naturally,
      - +10.0 for planted (prev_word -> next_word) continuations, letting
        tests pin exact decodes (the golden-test pattern of tests/bart.rs).

    ``encoder-decoder`` mode mirrors the reference's BART-style pipelines
    (decoder starts from BOS conditioned on the encoded source); ``causal``
    mode mirrors GPT2-style continuation (prompt ids are part of the
    context). is_encoder_decoder switches exactly the same behaviors as in
    the reference (pad side, prompt-in-output)."""

    def __init__(self, vocab_words: list[str],
                 planted: dict[str, str] | None = None, seed: int = 42,
                 is_encoder_decoder: bool = False):
        import re
        self.vocab: list[str] = list(SPECIALS) + list(vocab_words)
        self.word_id = {w: i for i, w in enumerate(self.vocab)}
        self.planted = dict(planted or {})
        self.seed = seed
        self.is_encoder_decoder = is_encoder_decoder
        # language-marker tokens (">>fr<<", "eng_Latn") behave like added
        # special tokens in the reference tokenizers: present in the vocab
        # for forced-BOS resolution, never produced as content and never
        # boosted by encoder presence
        marker = re.compile(r"^(>>.+<<|[a-z]{3}_[A-Z][a-z]{3})$")
        self.marker_ids = {i for i, w in enumerate(self.vocab)
                           if marker.match(w)}

    # -- tokenizer-ish helpers (word-level; OOV words map to PAD on encode
    #    of decoder prompts and are simply absent from generation) --------
    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> list[int]:
        return [self.word_id[w] for w in text.split() if w in self.word_id]

    def decode(self, ids: list[int], skip_special_tokens: bool = True,
               clean_up_tokenization_spaces: bool = True) -> str:
        """ids -> text, the reference decode triple (TokenizerOption::decode,
        common.rs:1397-1430; HF adapter hf_tokenizers.rs:499-510):
        ``skip_special_tokens`` drops specials AND added language markers,
        ``clean_up_tokenization_spaces`` applies the published
        clean_up_tokenization replacement list to the joined text."""
        from .tokenization import clean_up_tokenization
        words = []
        for i in ids:
            if skip_special_tokens and (i < len(SPECIALS)
                                        or i in self.marker_ids):
                continue
            words.append(self.vocab[int(i)])
        text = " ".join(words)
        return clean_up_tokenization(text) if clean_up_tokenization_spaces \
            else text

    def next_logits(self, contexts: list[list[int]],
                    encoder_rows: list[list[int]] | None = None) -> np.ndarray:
        V = self.vocab_size
        out = np.empty((len(contexts), V), dtype=np.float64)
        for r, raw_ctx in enumerate(contexts):
            # pads are batching artifacts, not context: a real model's
            # attention mask makes left-pads invisible — without this, a
            # row's logits would depend on its batchmates' lengths
            ctx = [t for t in raw_ctx if t != PAD_ID]
            last2 = tuple(int(t) for t in ctx[-2:])
            row = np.array(
                [_hash01(self.seed, last2, c) for c in range(V)])
            row[PAD_ID] = NEG_INF
            row[BOS_ID] = NEG_INF
            if self.marker_ids:
                # low-but-finite: a forced BOS must survive force_token_id
                row[sorted(self.marker_ids)] = -50.0
            if encoder_rows is not None:
                enc_set = {t for t in encoder_rows[r]
                           if t >= len(SPECIALS) and t not in self.marker_ids}
                if enc_set:
                    row[sorted(enc_set)] += 2.0
                    covered = len(enc_set & {t for t in ctx}) / len(enc_set)
                    row[EOS_ID] = 3.0 * covered
                else:
                    row[EOS_ID] = 4.0
            else:
                row[EOS_ID] = 0.35 + row[EOS_ID]
            prev_word = self.vocab[int(ctx[-1])] if ctx else ""
            want = self.planted.get(prev_word)
            if want is not None and want in self.word_id:
                row[self.word_id[want]] += 10.0
            out[r] = row
        return out


# --------------------------------------------------------------------------
# decode-math primitives
# --------------------------------------------------------------------------

def enforce_repetition_penalty(next_token_logits: np.ndarray,
                               prev_ids: list[list[int]],
                               repetition_penalty: float) -> None:
    """In place. Port of enforce_repetition_penalty
    (generation_utils.rs:476-507): per OCCURRENCE (a token generated twice
    is penalized twice — the reference re-reads the current value at each
    position), logit<0 is multiplied, logit>=0 divided."""
    for i, row_prev in enumerate(prev_ids):
        for tok in row_prev:
            v = next_token_logits[i, tok]
            next_token_logits[i, tok] = (
                v * repetition_penalty if v < 0 else v / repetition_penalty)


def banned_ngram_tokens(prev_ids: list[list[int]], no_repeat_ngram_size: int,
                        cur_len: int) -> list[list[int]]:
    """Port of get_banned_tokens (generation_utils.rs:509-553), itself a port
    of fairseq's sequence_generator: ban every token that would complete an
    n-gram already present in the hypothesis."""
    n = no_repeat_ngram_size
    if cur_len + 1 < n:
        return [[] for _ in prev_ids]
    out = []
    for row in prev_ids:
        generated: dict[tuple[int, ...], list[int]] = {}
        for k in range(len(row) - n + 1):
            key = tuple(row[k:k + n - 1])
            generated.setdefault(key, []).append(row[k + n - 1])
        query = tuple(row[cur_len + 1 - n:])
        out.append(generated.get(query, []))
    return out


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    return (x - m) - np.log(np.exp(x - m).sum(axis=axis, keepdims=True))


def top_k_top_p_filtering(logits: np.ndarray, top_k: int, top_p: float,
                          min_tokens_to_keep: int) -> None:
    """In place. Port of top_k_top_p_filtering (generation_utils.rs:555-620;
    Holtzman et al. 2019), including the reference's keep-first
    ``min_tokens_to_keep + 1`` quirk on the nucleus branch."""
    vocab_size = logits.shape[-1]
    if top_k > 0:
        k_remove = vocab_size - min(max(top_k, min_tokens_to_keep), vocab_size)
        if k_remove > 0:
            # indices of the k_remove SMALLEST logits (topk largest=false)
            idx = np.argpartition(logits, k_remove - 1, axis=-1)[:, :k_remove]
            np.put_along_axis(logits, idx, NEG_INF, axis=-1)
    if top_p < 1.0:
        sorted_idx = np.argsort(-logits, axis=-1, kind="stable")
        sorted_logits = np.take_along_axis(logits, sorted_idx, axis=-1)
        cumulative = np.cumsum(_softmax(sorted_logits, axis=-1), axis=-1)
        remove = cumulative >= top_p
        if min_tokens_to_keep > 1:
            remove[:, :min_tokens_to_keep + 1] = False   # :585-595 (the +1)
        remove[:, 1:] = remove[:, :-1].copy()            # shift right :597-604
        remove[:, 0] = False                             # :605-612
        indices_to_remove = np.zeros_like(remove)
        np.put_along_axis(indices_to_remove, sorted_idx, remove, axis=-1)
        logits[indices_to_remove] = NEG_INF


def force_token_id(scores: np.ndarray, token_id: int) -> None:
    """All mass on one token: everything else -inf (the reference's
    force_token_id_generation used by prepare_scores_for_generation)."""
    keep = scores[:, token_id].copy()
    scores[:] = NEG_INF
    scores[:, token_id] = keep


def prepare_scores_for_generation(scores: np.ndarray, current_length: int,
                                  max_length: int | None,
                                  forced_bos_token_id: int | None,
                                  forced_eos_token_id: int | None) -> None:
    """Port of prepare_scores_for_generation (generation_utils.rs:329-357):
    step 1 forces BOS when configured (the mBART translation path); the
    penultimate step forces EOS when the model defines one."""
    if current_length == 1:
        if forced_bos_token_id is not None:
            force_token_id(scores, forced_bos_token_id)
    elif (max_length is not None and forced_eos_token_id is not None
          and current_length == max_length - 1):
        force_token_id(scores, forced_eos_token_id)


def split_bad_word_ids(bad_word_ids):
    """Port of split_bad_word_ids (generation_utils.rs:674-703): length-1
    bad words become a static ban list; longer ones are banned dynamically
    when the hypothesis tail matches their prefix."""
    if not bad_word_ids:
        return None, None
    ones = [bw[0] for bw in bad_word_ids if len(bw) == 1]
    longer = [list(bw) for bw in bad_word_ids if len(bw) > 1]
    return (ones or None, longer or None)


def tokens_match(prev_tokens: list[int], tokens: list[int]) -> bool:
    """Port of tokens_match (:706-714): `tokens` is a suffix of prev."""
    if not tokens:
        return True
    if len(tokens) > len(prev_tokens):
        return False
    return prev_tokens[len(prev_tokens) - len(tokens):] == list(tokens)


def ban_bad_words(scores: np.ndarray, input_ids: list[list[int]],
                  static_ones: list[int] | None,
                  dynamic_longer: list[list[int]] | None) -> None:
    """In place. Port of calc_static_bad_word_mask + get_dynamic_bad_word_ids
    + ban_bad_words (:716-818): static length-1 bans apply always; a longer
    bad word bans its last token when the row ends with its prefix."""
    if static_ones:
        scores[:, static_ones] = NEG_INF
    if dynamic_longer:
        for i, row in enumerate(input_ids):
            for bw in dynamic_longer:
                if tokens_match(row, bw[:-1]):
                    scores[i, bw[-1]] = NEG_INF


def apply_prefix_allowed_tokens_fn(scores: np.ndarray,
                                   input_ids: list[list[int]],
                                   fn, num_beams: int) -> None:
    """In place. Port of apply_prefix_allowed_tokens_function (:649-672):
    everything outside fn(batch_id, row_ids) -> allowed token ids becomes
    -inf (the reference subtracts a +inf mask)."""
    mask = np.full(scores.shape, np.inf)
    for idx, row in enumerate(input_ids):
        allowed = fn(idx // num_beams, row)
        mask[idx, list(allowed)] = 0.0
    scores -= mask


def hamming_diversity_penalty(scores: np.ndarray, current_tokens: np.ndarray,
                              diversity_penalty: float, num_beams: int,
                              batch_size: int, group_size: int,
                              group_start_index: int,
                              vocab_size: int) -> None:
    """In place on the group's [batch*group_size, V] scores. Port of
    run_hamming_diversity_penalty (generation_utils.rs:620-647): subtract
    penalty * count(token among earlier groups' choices this step)."""
    if group_start_index <= 0:
        return
    for b in range(batch_size):
        prev = current_tokens[b * num_beams: b * num_beams + group_start_index]
        counts = np.bincount(prev.astype(np.int64), minlength=vocab_size)
        scores[b * group_size:(b + 1) * group_size] -= (
            diversity_penalty * counts)


# --------------------------------------------------------------------------
# beam hypotheses (generation_utils.rs:2260-2373)
# --------------------------------------------------------------------------

class BeamHypotheses:
    def __init__(self, num_beams: int, max_length: int | None,
                 length_penalty: float, early_stopping: bool):
        self.max_length = None if max_length is None else max_length - 1
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.num_beams = num_beams
        self.beams: list[tuple[float, list[int], list[float] | None]] = []
        self.worst_score = 1e9

    def __len__(self) -> int:
        return len(self.beams)

    def add(self, hypothesis: list[int], sum_log_probabilities: float,
            token_scores: list[float] | None = None) -> None:
        score = sum_log_probabilities / (
            len(hypothesis) ** self.length_penalty)
        if len(self.beams) < self.num_beams or score > self.worst_score:
            if token_scores is not None:
                # per-token increments from the saved CUMULATIVE step scores:
                # diff with a prepended 0 (generation_utils.rs:2324-2334)
                token_scores = list(np.diff(np.asarray(token_scores),
                                            prepend=0.0))
            self.beams.append((score, list(hypothesis), token_scores))
            if len(self.beams) > self.num_beams:
                worst_pos = min(range(len(self.beams)),
                                key=lambda i: self.beams[i][0])
                self.beams.pop(worst_pos)
            self.worst_score = min(s for s, _, _ in self.beams)

    def is_done(self, best_sum_log_probabilities: float,
                current_length: int) -> bool:
        if len(self.beams) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        return self.worst_score >= best_sum_log_probabilities / (
            current_length ** self.length_penalty)


def _pad_prompts(input_rows: list[list[int]],
                 is_encoder_decoder: bool) -> tuple[list[list[int]], int]:
    """Rectangularize ragged prompts: the reference pads LEFT for causal
    models and right for encoder-decoders (:455-470). Both decode paths need
    this — an unpadded shorter row would compute its no-repeat-ngram query
    slice against the global current_length and silently disable the ban."""
    rows = [list(r) for r in input_rows]
    cur = max(len(r) for r in rows)
    for r in rows:
        short = cur - len(r)
        if short:
            if is_encoder_decoder:
                r.extend([PAD_ID] * short)
            else:
                r[:0] = [PAD_ID] * short
    return rows, cur


# --------------------------------------------------------------------------
# greedy / sampling decode (generate_no_beam_search, :822-1035)
# --------------------------------------------------------------------------

def generate_no_beam_search(
    head: StandInLMHead,
    input_rows: list[list[int]],
    cfg: GenerateConfig,
    encoder_rows: list[list[int]] | None = None,
    forced_eos_token_id: int | None = None,
    prefix_allowed_tokens_fn=None,
    output_scores: bool = False,
) -> list[list[int]] | tuple[list[list[int]], list[list[float]], list[float]]:
    """Returns the full id sequences (prompt included, pad-filled tails for
    early-finished rows) exactly like the reference's returned input_ids.

    With ``output_scores`` (the reference's token_scores path,
    generation_utils.rs:845,965-974,1029-1055) also returns per-row
    per-step chosen-token log-probs (0.0 on steps after a row finished) and
    the sequence score sum(token_scores) / sentence_length^length_penalty,
    where sentence_length counts prompt + generated tokens up to and
    including EOS."""
    batch_size = len(input_rows)
    input_ids, cur = _pad_prompts(input_rows, head.is_encoder_decoder)
    unfinished = np.ones(batch_size, dtype=np.int64)
    sentence_lengths = np.ones(batch_size, dtype=np.int64)
    token_scores_steps: list[np.ndarray] = []
    rng = np.random.default_rng(cfg.seed)
    static_bad, dynamic_bad = split_bad_word_ids(cfg.bad_word_ids)
    current_length = cur
    while True:
        logits = head.next_logits(input_ids, encoder_rows)
        if cfg.repetition_penalty > 1.0:
            enforce_repetition_penalty(logits, input_ids,
                                       cfg.repetition_penalty)
        if cfg.bad_word_ids:                      # :885-901
            ban_bad_words(logits, input_ids, static_bad, dynamic_bad)
        if cfg.no_repeat_ngram_size > 0:
            for i, banned in enumerate(banned_ngram_tokens(
                    input_ids, cfg.no_repeat_ngram_size, current_length)):
                logits[i, banned] = NEG_INF
        if prefix_allowed_tokens_fn is not None:  # :923-931
            apply_prefix_allowed_tokens_fn(logits, input_ids,
                                           prefix_allowed_tokens_fn, 1)
        if current_length < cfg.min_length:       # eos ban before min_length
            logits[:, EOS_ID] = NEG_INF
        prepare_scores_for_generation(logits, current_length, cfg.max_length,
                                      cfg.forced_bos_token_id,
                                      forced_eos_token_id)
        if cfg.do_sample:
            if cfg.temperature > 1.0:
                logits /= cfg.temperature
            top_k_top_p_filtering(logits, cfg.top_k, cfg.top_p, 1)
            probs = _softmax(logits, axis=-1)
            next_token = np.array([rng.choice(len(p), p=p) for p in probs],
                                  dtype=np.int64)
        else:
            next_token = logits.argmax(axis=-1)
        if output_scores:
            # gather log_softmax of the (filtered) logits at the chosen
            # token; rows already finished contribute 0 (:965-974)
            logp = _log_softmax(logits, axis=-1)
            step = logp[np.arange(batch_size), next_token]
            token_scores_steps.append(np.where(unfinished == 0, 0.0, step))
        # finished rows append pad: next*u - pad*(u-1)  (:976-982)
        tokens_to_add = next_token * unfinished + PAD_ID * (1 - unfinished)
        for i, t in enumerate(tokens_to_add):
            input_ids[i].append(int(t))
        sentence_with_eos = (tokens_to_add == EOS_ID).astype(np.int64) * unfinished
        sentence_lengths = np.where(sentence_with_eos.astype(bool),
                                    current_length + 1, sentence_lengths)
        unfinished = -unfinished * (sentence_with_eos - 1)  # :995
        if unfinished.max() == 0:
            break
        current_length += 1
        if cfg.max_length is not None and current_length >= cfg.max_length:
            sentence_lengths = np.where(unfinished.astype(bool),
                                        current_length, sentence_lengths)
            break
    if not output_scores:
        return input_ids
    stacked = (np.stack(token_scores_steps, axis=1) if token_scores_steps
               else np.zeros((batch_size, 0)))
    seq_scores = list(stacked.sum(axis=1)
                      / sentence_lengths.astype(np.float64)
                      ** cfg.length_penalty)                   # :1029-1037
    return input_ids, [list(r) for r in stacked], [float(s) for s in seq_scores]


# --------------------------------------------------------------------------
# beam search (generate_beam_search, :1059-1550)
# --------------------------------------------------------------------------

def generate_beam_search(
    head: StandInLMHead,
    input_rows: list[list[int]],
    cfg: GenerateConfig,
    encoder_rows: list[list[int]] | None = None,
    forced_eos_token_id: int | None = None,
    prefix_allowed_tokens_fn=None,
    output_scores: bool = False,
) -> list[tuple]:
    """Returns num_return_sequences (hypothesis_ids, score) per input, best
    first — the reference's decoded output + sentence scores. With
    ``output_scores``, tuples gain a third element: per-token score
    increments, derived the reference's way (generation_utils.rs:1106,
    1341-1350,1405-1407,1457-1465): the CUMULATIVE beam_scores vector is
    saved per step WITHOUT reordering, a hypothesis takes its parent ROW's
    step history (EOS adds exclude the in-flight step), and add() diffs the
    cumulative history into increments."""
    batch_size = len(input_rows)
    nb = cfg.num_beams
    n_groups = cfg.num_beam_groups or 1
    gs = nb // n_groups                               # num_sub_beams
    diversity_penalty = (cfg.diversity_penalty
                         if cfg.diversity_penalty is not None else 5.5)
    V = head.vocab_size
    rng = np.random.default_rng(cfg.seed)
    static_bad, dynamic_bad = split_bad_word_ids(cfg.bad_word_ids)

    padded, _cur = _pad_prompts(input_rows, head.is_encoder_decoder)
    input_ids = [list(padded[b]) for b in range(batch_size)
                 for _ in range(nb)]
    enc = ([encoder_rows[b] for b in range(batch_size) for _ in range(nb)]
           if encoder_rows is not None else None)
    hypotheses = [BeamHypotheses(nb, cfg.max_length, cfg.length_penalty,
                                 cfg.early_stopping)
                  for _ in range(batch_size)]
    # only the first beam of each group starts live (:1088-1095)
    beam_scores = np.full((batch_size, nb), -1e9)
    beam_scores[:, ::gs] = 0.0
    beam_scores = beam_scores.reshape(-1)
    beam_tokens = np.zeros(batch_size * nb, dtype=np.int64)
    beam_indices = np.zeros(batch_size * nb, dtype=np.int64)
    done = [False] * batch_size
    current_length = max(len(r) for r in input_ids)
    current_tokens = np.zeros(batch_size * nb, dtype=np.int64)
    score_hist: list[np.ndarray] = []      # per-step cumulative beam_scores

    while True:
        logits_all = head.next_logits(input_ids, enc)   # [B*nb, V]
        for g in range(n_groups):
            g_start, g_end = g * gs, min(g * gs + gs, nb)
            bgi = np.array([b * nb + j for b in range(batch_size)
                            for j in range(g_start, g_end)])
            group_rows = [input_ids[j] for j in bgi]
            next_token_logits = logits_all[bgi].copy()
            if cfg.repetition_penalty > 1.0:
                enforce_repetition_penalty(next_token_logits, group_rows,
                                           cfg.repetition_penalty)
            if cfg.temperature > 1.0:
                next_token_logits /= cfg.temperature
            prepare_scores_for_generation(
                next_token_logits, current_length, cfg.max_length,
                cfg.forced_bos_token_id, forced_eos_token_id)
            scores = _log_softmax(next_token_logits, axis=-1)
            if current_length < cfg.min_length:
                scores[:, EOS_ID] = NEG_INF
            if cfg.bad_word_ids:                      # :1213-1231
                ban_bad_words(scores, group_rows, static_bad, dynamic_bad)
            if cfg.no_repeat_ngram_size > 0:
                for i, banned in enumerate(banned_ngram_tokens(
                        group_rows, cfg.no_repeat_ngram_size,
                        current_length)):
                    scores[i, banned] = NEG_INF
            if n_groups > 1:
                hamming_diversity_penalty(
                    scores, current_tokens, diversity_penalty, nb,
                    batch_size, gs, g_start, V)
            if prefix_allowed_tokens_fn is not None:  # :1262-1269
                apply_prefix_allowed_tokens_fn(
                    scores, group_rows, prefix_allowed_tokens_fn, gs)
            next_scores = scores + beam_scores[bgi, None]   # [B*gs, V]
            flat = next_scores.reshape(batch_size, gs * V)
            if cfg.do_sample:
                # filter PER BEAM ROW ([B*gs, V], min 2 kept per beam) before
                # flattening — the reference filters next_scores pre-view
                # (:1280-1292)
                filt = next_scores.copy()
                top_k_top_p_filtering(filt, cfg.top_k, cfg.top_p, 2)
                probs = _softmax(filt.reshape(batch_size, gs * V), axis=-1)
                nt, ns = [], []
                for b in range(batch_size):
                    # dead beams (score -1e9 at step 1) underflow to prob 0;
                    # torch's multinomial(replacement=False) tolerates
                    # sampling zero-prob categories once the support is
                    # exhausted — emulate: weighted-sample the support, then
                    # fill deterministically from outside it. Fillers carry
                    # their (-inf-ish) scores and sort last, so they never
                    # enter the live beams.
                    support = np.nonzero(probs[b])[0]
                    k = 2 * gs
                    if len(support) >= k:
                        picks = rng.choice(gs * V, size=k, replace=False,
                                           p=probs[b])
                    else:
                        drawn = rng.choice(gs * V, size=len(support),
                                           replace=False, p=probs[b])
                        rest = np.setdiff1d(np.arange(gs * V), support)
                        picks = np.concatenate([drawn,
                                                rest[:k - len(support)]])
                    vals = flat[b, picks]
                    order = np.argsort(-vals, kind="stable")
                    nt.append(picks[order])
                    ns.append(vals[order])
                next_tokens = np.stack(nt)
                next_scores_top = np.stack(ns)
            else:
                idx = np.argsort(-flat, axis=-1, kind="stable")[:, :2 * gs]
                next_tokens = idx
                next_scores_top = np.take_along_axis(flat, idx, axis=-1)
            beam_id = next_tokens // V                    # [B, 2gs]
            token_id = next_tokens - beam_id * V
            max_scores = next_scores_top.max(axis=1)
            is_eos = token_id == EOS_ID
            # finished-candidate bookkeeping (:1310-1352). The rank guard is
            # against the GROUP's beam count: an EOS candidate ranked worse
            # than the group's top gs beams is dropped (the reference
            # compares against num_beams, which equals gs when groups=1 and
            # is unreachable dead code when groups>1 — this is the intended
            # semantic)
            for b, pos in zip(*np.nonzero(is_eos)):
                if done[b] or pos >= gs:
                    continue
                # group-local beam row (the hypothesis content); full-space
                # index is recovered below for surviving beams
                parent = bgi[b * gs + beam_id[b, pos]]
                hypotheses[b].add(
                    list(input_ids[parent]),
                    float(next_scores_top[b, pos]),
                    ([h[parent] for h in score_hist]
                     if output_scores else None))
            # next beams: first gs non-eos candidates per row (:1316-1325)
            sel_scores = np.zeros((batch_size, gs))
            sel_tokens = np.full((batch_size, gs), PAD_ID, dtype=np.int64)
            sel_indices = np.zeros((batch_size, gs), dtype=np.int64)
            for b in range(batch_size):
                if done[b]:
                    continue                                # zeros/pad (:1355)
                keep = np.nonzero(~is_eos[b])[0][:gs]
                sel_scores[b] = next_scores_top[b, keep]
                sel_tokens[b] = token_id[b, keep]
                sel_indices[b] = b * gs + beam_id[b, keep]  # group space
                done[b] = done[b] or hypotheses[b].is_done(
                    float(max_scores[b]), current_length)
            # map group-space indices back to full beam space (:1389-1397)
            full_idx = (nb * (sel_indices // gs) + g_start
                        + sel_indices % gs)
            beam_scores[bgi] = sel_scores.reshape(-1)
            beam_tokens[bgi] = sel_tokens.reshape(-1)
            beam_indices[bgi] = full_idx.reshape(-1)
            if n_groups > 1:
                current_tokens[bgi] = sel_tokens.reshape(-1)
        if output_scores:                          # :1405-1407
            score_hist.append(beam_scores.copy())
        if all(done):
            break
        input_ids = [input_ids[beam_indices[k]] + [int(beam_tokens[k])]
                     for k in range(batch_size * nb)]
        current_length += 1
        if cfg.max_length is not None and current_length >= cfg.max_length:
            break

    # finalize open batches with their current beams (:1445-1476)
    for b in range(batch_size):
        if done[b]:
            continue
        for j in range(nb):
            k = b * nb + j
            hypotheses[b].add(list(input_ids[k]), float(beam_scores[k]),
                              ([h[k] for h in score_hist]
                               if output_scores else None))

    n_ret = 1 if cfg.do_sample else cfg.num_return_sequences
    out: list[tuple] = []
    for hyp in hypotheses:
        # stable sort by score; pop best from the end (:1496-1516)
        ordered = sorted(hyp.beams, key=lambda sb: sb[0])
        for _ in range(n_ret):
            score, ids, tok = ordered.pop()
            out.append((ids, score, tok) if output_scores else (ids, score))
    return out


# --------------------------------------------------------------------------
# generate() facade (greedy | sampling | beam dispatch, :1740-1800)
# --------------------------------------------------------------------------

def generate_ids(head: StandInLMHead, texts: list[str], cfg: GenerateConfig,
                 forced_eos_token_id: int | None = None,
                 prefix_allowed_tokens_fn=None,
                 output_scores: bool = False,
                 ) -> list[tuple]:
    """texts -> generated id sequences (+ beam score when beam-searched).
    With ``output_scores`` (GeneratedIndicesOutput.token_scores,
    generation_utils.rs:1616-1620) each tuple is (ids, score, token_scores):
    both decode paths return per-token log-prob increments, and the no-beam
    path's score becomes the real length-penalized sum instead of None.

    encoder-decoder mode: the decoder starts from [BOS] conditioned on the
    encoded source (BART/T5 shape); causal mode: the prompt ids prefix the
    output (GPT2 shape)."""
    cfg.validate()
    if head.is_encoder_decoder:
        encoder_rows: list[list[int]] | None = [head.encode(t) for t in texts]
        input_rows = [[BOS_ID] for _ in texts]
    else:
        encoder_rows = None
        input_rows = [[BOS_ID] + head.encode(t) for t in texts]
    # effective_batch_mult (generation_utils.rs:2023-2059): under sampling,
    # each input is replicated num_return_sequences times (input-major: the
    # reference expands dim 1 then flattens, so an input's replicas are
    # consecutive) and every replica decodes independently with its own rng
    # draws; sampled beam search then returns its single best per replica
    # (n_ret = 1 when do_sample). Greedy/beam without sampling never
    # replicates — identical replicas would be wasted compute.
    if cfg.do_sample and cfg.num_return_sequences > 1:
        k = cfg.num_return_sequences
        input_rows = [list(r) for r in input_rows for _ in range(k)]
        if encoder_rows is not None:
            encoder_rows = [list(r) for r in encoder_rows for _ in range(k)]
    if cfg.num_beams > 1:
        return generate_beam_search(head, input_rows, cfg, encoder_rows,
                                    forced_eos_token_id,
                                    prefix_allowed_tokens_fn,
                                    output_scores=output_scores)
    res = generate_no_beam_search(head, input_rows, cfg, encoder_rows,
                                  forced_eos_token_id,
                                  prefix_allowed_tokens_fn,
                                  output_scores=output_scores)
    if output_scores:
        seqs, token_scores, seq_scores = res
        return list(zip(seqs, seq_scores, token_scores))
    return [(s, None) for s in res]


# --------------------------------------------------------------------------
# pipelines (#19 text generation, #20 summarization, #21 translation)
# --------------------------------------------------------------------------

GREEDY_TEXT_CONFIG = GenerateConfig(
    do_sample=False, num_beams=1, max_length=24, min_length=0,
    no_repeat_ngram_size=3, repetition_penalty=1.0)


class TextGenerator:
    """Port of TextGenerationModel semantics (text_generation.rs:602-668):
    optional prefix is prepended as "{prefix} {text}", min/max lengths are
    extended by the prefix token count, and the prefix tokens are stripped
    from the decoded output.

    Output contract (reference: one string per generated sequence): a FLAT
    list of batch_size * num_return_sequences strings in input-major order —
    with num_return_sequences > 1, each input's hypotheses are consecutive."""

    def __init__(self, head: StandInLMHead, cfg: GenerateConfig):
        assert not head.is_encoder_decoder
        self.head = head
        self.cfg = cfg

    def generate(self, texts: list[str],
                 prefix: str | None = None) -> list[str]:
        cfg = self.cfg
        prompts = list(texts)
        prefix_length = 0
        if prefix is not None:
            prefix_length = len(self.head.encode(prefix))
            prompts = [f"{prefix} {t}" for t in texts]
            cfg = replace(
                cfg,
                min_length=cfg.min_length + prefix_length,
                max_length=(None if cfg.max_length is None
                            else cfg.max_length + prefix_length))
        out = []
        strip = prefix_length if prefix is not None else 0
        for ids, _ in generate_ids(self.head, prompts, cfg):
            # reference decodes [prefix_length..] then skips specials; our
            # prompt is part of the output in causal mode, so drop the
            # prefix tokens and keep the original text continuation. Causal
            # batches are LEFT-padded, so slice relative to BOS, not 0 —
            # slicing from 0 would strip pads and leak the prefix on the
            # shorter rows of a ragged batch.
            bos = ids.index(BOS_ID)
            out.append(self.head.decode(ids[bos + 1 + strip:]))
        return out


SUMMARIZATION_CONFIG = GenerateConfig(
    # SummarizationConfig::new defaults (summarization.rs:88-170)
    min_length=56, max_length=142, do_sample=False, early_stopping=True,
    num_beams=3, temperature=1.0, top_k=50, top_p=1.0,
    repetition_penalty=1.0, length_penalty=1.0, no_repeat_ngram_size=3,
    num_return_sequences=1)


class Summarizer:
    """Port of SummarizationModel semantics (summarization.rs:509-536):
    encoder-decoder generation with the CNN-DM config defaults; returns one
    summary string per input."""

    def __init__(self, head: StandInLMHead,
                 cfg: GenerateConfig = SUMMARIZATION_CONFIG):
        assert head.is_encoder_decoder
        self.head = head
        self.cfg = cfg

    def summarize(self, texts: list[str]) -> list[str]:
        return [self.head.decode(ids)
                for ids, _ in generate_ids(self.head, texts, self.cfg)]


# --------------------------------------------------------------------------
# ONNX swap paths (#23): the session-backed generators behind the head
# protocol, so every generation pipeline swaps by construction
# --------------------------------------------------------------------------

class ONNXCausalLMHead(StandInLMHead):
    """ONNX-served drop-in for the causal ``StandInLMHead`` — the
    real-runtime swap path for the GPT-2-shaped pipelines (#19 text
    generation, #22 conversation), completing the ModelResource::{Torch,
    ONNX} duality at the pipeline surface for the causal family the way
    ``ONNXSeq2SeqLMHead`` does for seq2seq. Wraps an ``ONNXCausalDecoder``
    (two-session with/without-past dispatch, onnx/models.rs:218-287):
    when this call's contexts extend the previous call's by exactly one
    token per row, only the new token column is fed with the KV cache;
    any other shape re-feeds the full sequence to the without-past
    session. Left pads are masked out of attention, mirroring the
    stand-in's pads-are-invisible contract."""

    def __init__(self, vocab_words: list[str], decoder, seed: int = 42):
        super().__init__(vocab_words, planted=None, seed=seed,
                         is_encoder_decoder=False)
        self.decoder = decoder
        self.reset_cache()

    def reset_cache(self) -> None:
        self._prev_contexts: tuple | None = None
        self._cache = None

    def next_logits(self, contexts: list[list[int]],
                    encoder_rows: list[list[int]] | None = None) -> np.ndarray:
        if encoder_rows is not None:
            raise ValueError("ONNXCausalLMHead is causal-only: "
                             "encoder_rows must be None")
        snap = tuple(tuple(int(t) for t in r) for r in contexts)
        full_ids = np.array([list(c) for c in snap], dtype=np.int64)
        mask = (full_ids != PAD_ID).astype(np.int64)
        incremental = (
            self.decoder.use_past and self._cache is not None
            and self._prev_contexts is not None
            and len(snap) == len(self._prev_contexts)
            and all(len(c) == len(p) + 1 and c[:-1] == p
                    for c, p in zip(snap, self._prev_contexts)))
        if incremental:
            new_ids = full_ids[:, -1:]
            logits, cache = self.decoder.forward(new_ids, mask,
                                                 cache=self._cache)
        else:
            logits, cache = self.decoder.forward(full_ids, mask)
        self._prev_contexts = snap
        self._cache = cache if self.decoder.use_past else None
        return np.asarray(logits[:, -1, :], dtype=np.float64)

class ONNXSeq2SeqLMHead(StandInLMHead):
    """ONNX-served drop-in for the encoder-decoder ``StandInLMHead`` — the
    real-runtime swap path for the seq2seq pipelines (#20 summarization,
    #21 translation), mirroring how ONNXConditionalGenerator implements
    the same PrivateLanguageGenerator surface the Torch models do
    (onnx/models.rs:986-1102). The word-level encode/decode surface is
    inherited, so ``Summarizer(head=...)`` / ``Translator(head=...)`` is a
    pure construction change (ModelResource::{Torch, ONNX},
    common.rs:85-89); only ``next_logits`` changes brains.

    Session scheduling follows prepare_inputs_for_generation
    (models.rs:1052-1080): encoder states are computed ONCE per source
    batch and reused every step; when this call's contexts extend the
    previous call's by exactly one token per row (the greedy/sampling
    loop's step contract) and a with-past session exists, only the new
    token column is fed with the KV cache; any other shape — first step,
    beam-search reorder, new batch — re-feeds the full target prefix to
    the without-past session (the reference's ``use_past=false`` arm).
    Both paths are pinned bit-identical by the mock-session contract test,
    so the fallback is a performance choice, never a semantic one.

    The sessions' ``logits`` output must cover this head's vocab
    (specials + words + markers) — the same requirement the reference
    places on a checkpoint matching its tokenizer."""

    def __init__(self, vocab_words: list[str], generator, seed: int = 42):
        super().__init__(vocab_words, planted=None, seed=seed,
                         is_encoder_decoder=True)
        self.generator = generator
        self.reset_cache()

    def reset_cache(self) -> None:
        self._prev_contexts: tuple | None = None
        self._cache = None
        self._enc_key: tuple | None = None
        self._enc_states = None
        self._enc_mask = None

    def _encode_source(self, encoder_rows: list[list[int]]):
        n = max((len(r) for r in encoder_rows), default=0) or 1
        ids = np.full((len(encoder_rows), n), PAD_ID, dtype=np.int64)
        mask = np.zeros((len(encoder_rows), n), dtype=np.int64)
        for i, r in enumerate(encoder_rows):
            ids[i, :len(r)] = r
            mask[i, :len(r)] = 1
        return ids, mask

    def next_logits(self, contexts: list[list[int]],
                    encoder_rows: list[list[int]] | None = None) -> np.ndarray:
        if encoder_rows is None:
            raise ValueError("ONNXSeq2SeqLMHead is encoder-decoder only: "
                             "encoder_rows must be provided")
        key = tuple(tuple(int(t) for t in r) for r in encoder_rows)
        if key != self._enc_key:
            ids, mask = self._encode_source(encoder_rows)
            self.reset_cache()
            self._enc_key = key
            self._enc_states = self.generator.encode(ids, mask)
            self._enc_mask = mask
        snap = tuple(tuple(int(t) for t in r) for r in contexts)
        incremental = (
            self.generator.use_past and self._cache is not None
            and self._prev_contexts is not None
            and len(snap) == len(self._prev_contexts)
            and all(len(c) == len(p) + 1 and c[:-1] == p
                    for c, p in zip(snap, self._prev_contexts)))
        if incremental:
            dec_ids = np.array([[c[-1]] for c in snap], dtype=np.int64)
            logits, cache = self.generator.forward(
                encoder_hidden_states=self._enc_states,
                encoder_attention_mask=self._enc_mask,
                decoder_input_ids=dec_ids, cache=self._cache)
        else:
            dec_ids = np.array([list(c) for c in snap], dtype=np.int64)
            logits, cache = self.generator.forward(
                encoder_hidden_states=self._enc_states,
                encoder_attention_mask=self._enc_mask,
                decoder_input_ids=dec_ids, cache=None)
        self._prev_contexts = snap
        self._cache = cache if self.generator.use_past else None
        return np.asarray(logits[:, -1, :], dtype=np.float64)
