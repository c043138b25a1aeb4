"""Conversation pipeline (#22): state machine, turn-boundary truncation,
batched multi-turn responses (conversation.rs ports)."""

from __future__ import annotations

import pytest

from kgforge.conversation import (Conversation,
                                  ConversationManager, ConversationModel)
from kgforge.generation import EOS_ID, StandInLMHead

VOCAB = ["movies", "tonight", "action", "comedy", "great", "watch",
         "popcorn", "cinema", "ticket", "seat"]


def _model(**kw):
    return ConversationModel(StandInLMHead(VOCAB, seed=42), **kw)


# --------------------------------------------------------------------------
# state machine (:259-348)
# --------------------------------------------------------------------------

def test_add_user_input_rejects_pending():
    c = Conversation()
    c.add_user_input("Hi there!")
    with pytest.raises(ValueError, match="already provided"):
        c.add_user_input("again")


def test_add_user_input_with_overwrite_returns_old():
    c = Conversation()
    assert c.add_user_input_with_overwrite("first") is None
    assert c.add_user_input_with_overwrite("second") == "first"
    assert c.new_user_input == "second"


def test_mark_processed_moves_input():
    c = Conversation()
    c.add_user_input("Hi")
    assert c.contains_new_input()
    c.mark_processed()
    assert not c.contains_new_input()
    assert c.past_user_inputs == ["Hi"]
    c.mark_processed()                      # idempotent on empty
    assert c.past_user_inputs == ["Hi"]


def test_manager_registry_and_active():
    m = ConversationManager()
    a = m.create("movies tonight")
    b = m.create()                          # no input yet -> inactive
    ids, convs = m.get_active_conversations()
    assert ids == [a] and convs[0].new_user_input == "movies tonight"
    m.get(b).add_user_input("action")
    assert len(m.get_active_conversations()[0]) == 2
    m.remove(a)
    assert a not in m.conversations


# --------------------------------------------------------------------------
# encoding + truncation (:975-1103)
# --------------------------------------------------------------------------

def test_encode_prompts_truncates_and_appends_eos():
    model = _model(max_allowed_context_length=4)
    (ids,) = model.encode_prompts(["movies tonight action comedy great"])
    assert len(ids) == 4                    # max-1 tokens + EOS
    assert ids[-1] == EOS_ID


def test_truncation_cuts_at_turn_boundary():
    w = StandInLMHead(VOCAB).word_id
    # two eos-terminated turns + new input: 3+3+3=9
    hist = [w["movies"], w["tonight"], EOS_ID,
            w["action"], w["comedy"], EOS_ID]
    inp = [w["great"], w["watch"], EOS_ID]
    # max 8: the first boundary satisfying the reference's strict
    # (n - max - i < 0) filter is after turn 1 -> turn 1 dropped
    (row,) = _model(max_allowed_context_length=8) \
        .concat_input_history([inp], [hist])
    assert row == [w["action"], w["comedy"], EOS_ID] + inp
    # max 6: that boundary fails the strict filter (9-6-2 = 1, not < 0);
    # the next boundary is after turn 2, leaving only the new input —
    # the reference's exact off-by-strictness behavior
    (row6,) = _model(max_allowed_context_length=6) \
        .concat_input_history([inp], [hist])
    assert row6 == inp


def test_truncation_mid_turn_when_no_boundary_fits():
    model = _model(max_allowed_context_length=4)
    w = StandInLMHead(VOCAB).word_id
    # boundary-free history (no EOS anywhere except the final input EOS,
    # which the reference's `i != n-1` filter excludes)
    hist = [w["movies"], w["tonight"], w["action"], w["comedy"],
            w["great"]]
    inp = [w["watch"], EOS_ID]
    (row,) = model.concat_input_history([inp], [hist])
    assert len(row) == 4                    # start_length - max fallback
    assert row == [w["comedy"], w["great"]] + inp


# --------------------------------------------------------------------------
# batched multi-turn responses (:888-973)
# --------------------------------------------------------------------------

def test_generate_responses_updates_state_and_batches():
    model = _model()
    m = ConversationManager()
    a = m.create("movies tonight")
    b = m.create("action comedy")
    out = model.generate_responses(m)
    assert set(out) == {a, b}
    for cid in (a, b):
        c = m.get(cid)
        assert not c.contains_new_input()
        assert len(c.past_user_inputs) == 1
        assert len(c.generated_responses) == 1
        assert len(c.history) == 2          # prompt ids + response ids
        assert c.history[0][-1] == EOS_ID
    # no active conversations left -> no-op
    assert model.generate_responses(m) == {}


def test_second_turn_depends_on_history():
    """The same user input must decode differently in a conversation that
    carries history (the whole point of the stateful pipeline)."""
    model = _model()
    m1 = ConversationManager()
    fresh = m1.create("great watch")
    r_fresh = model.generate_responses(m1)[fresh]

    m2 = ConversationManager()
    two = m2.create("movies tonight")
    model.generate_responses(m2)
    m2.get(two).add_user_input("great watch")
    r_hist = model.generate_responses(m2)[two]
    assert r_fresh != r_hist


def test_batch_equals_solo():
    """Batched decode of many conversations == each decoded alone."""
    model = _model()
    solo = ConversationManager()
    s = solo.create("movies tonight")
    r_solo = model.generate_responses(solo)[s]

    batch = ConversationManager()
    x = batch.create("movies tonight")
    batch.create("action comedy great")
    r_batch = model.generate_responses(batch)[x]
    assert r_solo == r_batch


def test_batch_invariance_with_degenerate_prompt():
    """A conversation whose input encodes to [EOS] only (all words OOV)
    must decode identically solo and co-batched with longer conversations:
    left-padding is a batching artifact and must stay invisible to the
    head (the attention-mask equivalence)."""
    model = _model()
    solo = ConversationManager()
    s = solo.create("xyzzy qwerty")          # all OOV -> encodes to [EOS]
    r_solo = model.generate_responses(solo)[s]

    batch = ConversationManager()
    x = batch.create("xyzzy qwerty")
    batch.create("movies tonight action comedy great watch popcorn")
    r_batch = model.generate_responses(batch)[x]
    assert r_solo == r_batch
    assert r_solo != ""                      # it really decodes something


def test_deterministic():
    def run():
        model = _model()
        m = ConversationManager()
        cid = m.create("popcorn cinema")
        model.generate_responses(m)
        m.get(cid).add_user_input("ticket seat")
        model.generate_responses(m)
        c = m.get(cid)
        return c.generated_responses

    assert run() == run()
