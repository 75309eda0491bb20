"""Hand-computed policy tests for preference_pairs (DPO pair
construction) and conversation_branches (retry-tree shared-prefix
detection) — every selection rule (token ordering, tie-breaks,
identical-response exclusion, missing prompt/response exclusion,
deepest-shared-prefix pick, max_depth cap) pinned on inputs small
enough to verify by hand."""

from pyspark.sql import functions as F

from engine.spark.pipeline import conversation_branches, preference_pairs


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, cleaned_text string"
    )


def test_preference_pairs_policy(spark):
    # token estimator: max(1, floor(len/4)) → "x"*40 = 10 tokens
    rows = [
        # group 1: same prompt, three different responses → one pair
        ("A", 0, "user", "same prompt"),
        ("A", 1, "assistant", "x" * 40),  # 10 tokens → chosen
        ("B", 0, "user", "same prompt"),
        ("B", 1, "assistant", "y" * 16),  # 4 tokens → rejected
        ("C", 0, "user", "same prompt"),
        ("C", 1, "assistant", "z" * 28),  # 7 tokens → neither
        # group 2: identical responses (pure re-run) → NO pair
        ("D", 0, "user", "rerun prompt"),
        ("D", 1, "assistant", "identical answer"),
        ("E", 0, "user", "rerun prompt"),
        ("E", 1, "assistant", "identical answer"),
        # group 3: token tie but different text → pair, tie-broken
        ("X", 0, "user", "tie prompt"),
        ("X", 1, "assistant", "aaaa"),  # 1 token
        ("Y", 0, "user", "tie prompt"),
        ("Y", 1, "assistant", "bbbb"),  # 1 token
        # no user turn → skipped (would otherwise join group 1)
        ("G", 0, "assistant", "x" * 400),
        # no assistant turn → skipped
        ("H", 0, "user", "same prompt"),
        ("H", 1, "user", "still me"),
    ]
    got = {
        r.prompt_h: r for r in preference_pairs(_turns(spark, rows)).collect()
    }
    assert len(got) == 2
    by_pair = {(r.chosen_conv, r.rejected_conv): r for r in got.values()}
    g1 = by_pair[("A", "B")]
    assert (g1.chosen_tokens, g1.rejected_tokens) == (10, 4)
    # H has no assistant turn, so group 1 counts A, B, C only
    assert g1.n_candidates == 3
    g3 = by_pair[("X", "Y")]  # tie: chosen=min conv, rejected=max conv
    assert (g3.chosen_tokens, g3.rejected_tokens) == (1, 1)
    assert g3.n_candidates == 2


def test_preference_pairs_multiturn_prompt_is_first_user_turn(spark):
    # prompt = FIRST user turn, even when assistant speaks first;
    # response spans ALL assistant turns (both fp and token sum)
    rows = [
        ("M", 0, "assistant", "system-ish greeting"),
        ("M", 1, "user", "the real prompt"),
        ("M", 2, "assistant", "p" * 8),   # 2 tokens
        ("M", 3, "user", "followup"),
        ("M", 4, "assistant", "q" * 12),  # 3 tokens → total 5 + greeting
        ("N", 0, "assistant", "system-ish greeting"),
        ("N", 1, "user", "the real prompt"),
        ("N", 2, "assistant", "p" * 8),
    ]
    out = preference_pairs(_turns(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    greet = max(1, len("system-ish greeting") // 4)
    assert (r.chosen_conv, r.rejected_conv) == ("M", "N")
    assert r.chosen_tokens == greet + 2 + 3
    assert r.rejected_tokens == greet + 2


def test_conversation_branches_deepest_shared_prefix(spark):
    rows = [
        ("c1", 0, None, "aaaa"), ("c1", 1, None, "bbbb"), ("c1", 2, None, "c1 end"),
        ("c2", 0, None, "aaaa"), ("c2", 1, None, "bbbb"), ("c2", 2, None, "c2 end"),
        ("c3", 0, None, "aaaa"), ("c3", 1, None, "zzzz"),
        ("c4", 0, None, "totally alone"),
    ]
    got = {r.conv_id: r for r in conversation_branches(_turns(spark, rows)).collect()}
    assert set(got) == {"c1", "c2", "c3"}  # c4 shares nothing
    assert got["c1"].shared_turns == 2 and got["c1"].family_size == 2
    assert got["c2"].shared_turns == 2 and got["c2"].family_size == 2
    assert got["c1"].family_id == got["c2"].family_id
    # c3 only shares turn 0, with ALL THREE convs
    assert got["c3"].shared_turns == 1 and got["c3"].family_size == 3
    # shared_tokens: each 4-char turn is 1 token
    assert got["c1"].shared_tokens == 2 and got["c3"].shared_tokens == 1


def test_conversation_branches_depth_cap_and_exact_dup(spark):
    # two convs identical through turn 39, diverging at turn 35 would
    # be seen — but max_depth=8 caps the comparison at 8 turns
    rows = []
    for cid in ("d1", "d2"):
        for i in range(12):
            rows.append((cid, i, None, f"turn {i}" if i < 10 or cid == "d1"
                         else f"div {i}"))
    got = {
        r.conv_id: r
        for r in conversation_branches(_turns(spark, rows), max_depth=8).collect()
    }
    # divergence (turn 10) is beyond the cap → both share the full
    # capped prefix of 8 turns
    assert got["d1"].shared_turns == 8 == got["d2"].shared_turns
    assert got["d1"].family_id == got["d2"].family_id
    assert got["d1"].family_size == 2


def test_conversation_branches_divergence_inside_cap(spark):
    rows = []
    for cid in ("e1", "e2"):
        for i in range(6):
            rows.append(
                (cid, i, None, f"turn {i}" if i < 4 else f"{cid} turn {i}")
            )
    got = {
        r.conv_id: r
        for r in conversation_branches(_turns(spark, rows), max_depth=8).collect()
    }
    assert got["e1"].shared_turns == 4 == got["e2"].shared_turns


def test_entry_forms_nonvacuous(spark):
    """The driver entry forms over the planted corpus actually
    exercise both policies: '~near' truncated copies yield real pairs
    (and appear as the rejected side), '~dup' exact copies never
    fabricate a pair, and the branch families include the planted
    three-member (orig, ~dup, ~near) prefix group."""
    import __spark_entry__ as e

    qs = e.queries()
    pairs = qs["preference_pairs"](spark, "/root/testdata/sf0.01").collect()
    assert pairs
    # the halved-assistant '~alt' copies are the real-pair source
    assert any(r.rejected_conv.endswith("~alt") for r in pairs)
    # an exact copy can never be one side of a pair with its original
    # (identical response fingerprints are gated out)
    for r in pairs:
        assert r.chosen_conv + "~dup" != r.rejected_conv
        assert r.rejected_conv + "~dup" != r.chosen_conv
        assert r.chosen_tokens >= r.rejected_tokens
        assert r.n_candidates >= 2

    rows = qs["conversation_branches"](spark, "/root/testdata/sf0.01").collect()
    by_conv = {r.conv_id: r for r in rows}
    assert any(c.endswith("~dup") for c in by_conv)
    assert any(c.endswith("~near") for c in by_conv)
    assert any(r.family_size >= 3 for r in rows)
    for cid, r in by_conv.items():
        if cid.endswith("~dup"):
            orig = by_conv[cid[: -len("~dup")]]
            # exact copy and original share their full (capped) length
            assert r.shared_turns == orig.shared_turns
            assert r.family_id == orig.family_id
