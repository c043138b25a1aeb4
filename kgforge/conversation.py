"""Conversation pipeline (#22) — the reference's stateful multi-turn
manager re-expressed for a batch engine: conversation state is DATA (a
table of histories), and one ``generate_responses`` step advances every
active conversation in a single batched decode.

Ported semantics (src/pipelines/conversation.rs):
  - ``Conversation`` state machine: add_user_input errors on a pending
    input (:259-270), add_user_input_with_overwrite returns the replaced
    text (:292-297), mark_processed moves the input to past_user_inputs
    (:342-348)
  - ``ConversationManager``: uuid-keyed registry, active = has new input
    (:469)
  - ``encode_prompts``: tokenize, truncate to max_allowed-1, append EOS
    (:1090-1103) — EOS doubles as the turn separator
  - ``concat_input_history`` + ``get_truncated_input_index``: history ++
    new input, truncated from the LEFT at the first turn boundary (EOS
    position) that fits max_allowed_context_length; if no boundary fits,
    cut mid-turn at start_length - max_length (:975-1063)
  - ``generate_responses``: batched decode over the concatenated ids, the
    response is the suffix past the input (padding removed — the
    clean_padding_indices role, :888-973); response ids and prompt ids are
    appended to the history

The decode itself is kgforge.generation.generate_no_beam_search (the same
DialoGPT-style causal loop the reference uses via generate_from_ids).
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field

from .generation import (EOS_ID, PAD_ID, GenerateConfig, StandInLMHead,
                         generate_no_beam_search)


@dataclass
class Conversation:
    """Reference Conversation (conversation.rs:192-250)."""
    past_user_inputs: list[str] = field(default_factory=list)
    generated_responses: list[str] = field(default_factory=list)
    new_user_input: str | None = None
    history: list[list[int]] = field(default_factory=list)

    def add_user_input(self, text: str) -> None:
        if self.new_user_input is not None:
            raise ValueError("User input already provided for this "
                             "conversation")
        self.new_user_input = text

    def add_user_input_with_overwrite(self, text: str) -> str | None:
        old = self.new_user_input
        self.new_user_input = text
        return old

    def contains_new_input(self) -> bool:
        return self.new_user_input is not None

    def mark_processed(self) -> None:
        if self.new_user_input is not None:
            self.past_user_inputs.append(self.new_user_input)
            self.new_user_input = None

    def get_last_response(self) -> str | None:
        return self.generated_responses[-1] if self.generated_responses \
            else None


class ConversationManager:
    """uuid-keyed registry (conversation.rs:469-560)."""

    def __init__(self):
        self.conversations: dict[str, Conversation] = {}

    def create(self, text: str | None = None) -> str:
        cid = str(_uuid.uuid4())
        conv = Conversation()
        if text is not None:
            conv.add_user_input(text)
        self.conversations[cid] = conv
        return cid

    def get(self, cid: str) -> Conversation:
        return self.conversations[cid]

    def remove(self, cid: str) -> Conversation:
        return self.conversations.pop(cid)

    def get_active_conversations(self) -> tuple[list[str], list[Conversation]]:
        ids = [cid for cid, c in self.conversations.items()
               if c.contains_new_input()]
        return ids, [self.conversations[cid] for cid in ids]


CONVERSATION_CONFIG = GenerateConfig(
    # ConversationConfig mirrors GenerateConfig with DialoGPT-ish bounds;
    # small max keeps the stand-in decode bounded
    min_length=0, max_length=40, do_sample=False, num_beams=1,
    no_repeat_ngram_size=3, repetition_penalty=1.2)


class ConversationModel:
    """Batched multi-turn responder over the stand-in causal head."""

    def __init__(self, head: StandInLMHead,
                 cfg: GenerateConfig = CONVERSATION_CONFIG,
                 max_allowed_context_length: int | None = 24):
        assert not head.is_encoder_decoder
        self.head = head
        self.cfg = cfg
        self.max_allowed_context_length = max_allowed_context_length

    def encode_prompts(self, texts: list[str]) -> list[list[int]]:
        """Port of encode_prompts (:1090-1103): truncate to max-1, add EOS."""
        out = []
        for t in texts:
            ids = self.head.encode(t)
            if self.max_allowed_context_length is not None:
                ids = ids[:self.max_allowed_context_length - 1]
            ids.append(EOS_ID)
            out.append(ids)
        return out

    def _truncated_input_index(self, history: list[int],
                               max_length: int) -> int:
        """Port of get_truncated_input_index (:1043-1063): cut at the first
        turn boundary (position after an EOS) that fits; else mid-turn."""
        n = len(history)
        for i, e in enumerate(history):
            if (e == EOS_ID and i != n - 1
                    and (n - max_length - i) < 0):
                return i + 1
        return n - max_length

    def concat_input_history(self, inputs: list[list[int]],
                             history: list[list[int]]) -> list[list[int]]:
        """Port of concat_input_history (:975-1041), minus the tensor
        padding (generate_no_beam_search pads internally)."""
        assert len(inputs) == len(history), \
            "Length of inputs should equal length of history"
        rows = []
        for inp, hist in zip(inputs, history):
            row = list(hist) + list(inp)
            mx = self.max_allowed_context_length
            if mx is not None and len(row) > mx:
                row = row[self._truncated_input_index(row, mx):]
            rows.append(row)
        return rows

    def generate_responses(self, manager: ConversationManager
                           ) -> dict[str, str]:
        """Port of generate_responses (:888-950): one batched decode step
        for every active conversation; histories updated in place."""
        ids, convs = manager.get_active_conversations()
        if not ids:
            return {}
        texts = [c.new_user_input for c in convs]
        prompt_ids = self.encode_prompts(texts)
        rows = self.concat_input_history(
            prompt_ids, [sum(c.history, []) for c in convs])
        # every row is LEFT-padded to the batch max inside the decode
        # (generation._pad_prompts), so the generated suffix of each
        # returned row starts at the same index
        input_length = max(len(r) for r in rows)
        generated = generate_no_beam_search(self.head, rows, self.cfg)
        out: dict[str, str] = {}
        for cid, conv, row, p_ids in zip(ids, convs, generated, prompt_ids):
            # response = suffix past the (padded) input; pads removed — the
            # clean_padding_indices role (:955-973)
            response_ids = [t for t in row[input_length:] if t != PAD_ID]
            conv.generated_responses.append(self.head.decode(response_ids))
            conv.history.append(list(p_ids))
            conv.history.append(response_ids)
            conv.mark_processed()
            out[cid] = conv.get_last_response() or ""
        return out
