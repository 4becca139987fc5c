"""WordPiece tokenizer parity tests vs transformers BertTokenizer."""

import numpy as np
import pytest

from czechtriever_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "quick",
         "brown", "fox", "##es", "jump", "##ed", "over", "do", "##g", "!",
         "pra", "##ha", ",", "a", "un", "##aff", "##able"]

TEXTS = ["The quick brown foxes jumped over the dog!",
         "Praha, unaffable word", "  whitespace   test ", "punct!,!end",
         "", "UPPER lower MiXeD", "Čeština with díacritics",
         "word" * 60]  # > max_word_chars -> UNK


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    vf = d / "vocab.txt"
    vf.write_text("\n".join(VOCAB) + "\n")
    from transformers import BertTokenizer
    hf = BertTokenizer(str(vf), do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(str(vf), do_lower_case=True)
    return hf, ours


class TestParity:
    def test_encode_matches_hf(self, pair):
        hf, ours = pair
        for t in TEXTS:
            assert ours.encode(t) == hf.encode(t), repr(t)

    def test_no_special_tokens(self, pair):
        hf, ours = pair
        t = TEXTS[0]
        assert (ours.encode(t, add_special_tokens=False)
                == hf.encode(t, add_special_tokens=False))

    def test_truncation(self, pair):
        hf, ours = pair
        t = "the quick brown foxes " * 20
        assert (ours.encode(t, max_length=16, truncation=True)
                == hf.encode(t, max_length=16, truncation=True))

    def test_special_ids(self, pair):
        hf, ours = pair
        assert ours.cls_token_id == hf.cls_token_id
        assert ours.sep_token_id == hf.sep_token_id
        assert ours.pad_token_id == hf.pad_token_id
        assert ours.mask_token_id == hf.mask_token_id
        # bos/eos mapped to CLS/SEP (reference src/moco.py:244-248)
        assert ours.bos_token_id == ours.cls_token_id
        assert ours.eos_token_id == ours.sep_token_id


class TestBatch:
    def test_batch_encode_shapes(self, pair):
        _, ours = pair
        ids, mask = ours.batch_encode(["the fox", "quick brown foxes jumped"],
                                      max_length=8)
        assert ids.shape == mask.shape == (2, 8)
        np.testing.assert_array_equal(mask.sum(1), [4, 8])

    def test_call_interface(self, pair):
        _, ours = pair
        out = ours("the fox")
        assert out["input_ids"].shape[0] == 1

    def test_decode_roundtrip(self, pair):
        _, ours = pair
        assert ours.decode(ours.encode("the quick foxes!")) == "the quick foxes !"


class TestFastBasicTokenize:
    """The vectorized basic tokenizer must match the per-character
    reference implementation on adversarial unicode."""

    CASES = [
        "Příliš žluťoučký kůň úpěl ďábelské ódy",
        "PŘÍLIŠ ŽLUŤOUČKÝ KŮŇ",
        "hello, world!  multiple   spaces\tand\ttabs\nnewlines",
        "中文字符测试 mixed with latin",
        "中é́ combining", "",
        "\x00control\x01chars\x7f here�",
        "İstanbul ẞharp Straße",     # multi-char lowercase expansions
        "emoji 🙂 and astral 𝔘𝔫𝔦 chars",
        "„czech quotes“ a –dashes—",
        "豈 compat ideograph",   # NFD remaps into the CJK main block
        "áb̊c",           # bare combining marks
        "   ",
        "word" * 60,
        "punct.!?seq;;;", "a", ".", "ř",
    ]

    @pytest.mark.parametrize("lower", [True, False])
    def test_matches_slow_path(self, lower):
        from czechtriever_tpu.data import tokenizer as T
        tok = WordPieceTokenizer({"[UNK]": 1}, do_lower_case=lower)
        for text in self.CASES:
            fast = T._basic_tokenize_fast(text, lower, tok.strip_accents)
            slow = tok._basic_tokenize_slow(text)
            assert fast == slow, (text, fast, slow)

    def test_random_fuzz_matches_slow(self):
        from czechtriever_tpu.data import tokenizer as T
        rng = np.random.default_rng(0)
        pools = [(32, 127), (0x80, 0x250), (0x300, 0x370),
                 (0x4E00, 0x4E80), (0x1F600, 0x1F640), (0x2000, 0x2070)]
        tok = WordPieceTokenizer({"[UNK]": 1}, do_lower_case=True)
        for _ in range(60):
            lo, hi = pools[int(rng.integers(0, len(pools)))]
            cps = rng.integers(lo, hi, size=int(rng.integers(1, 80)))
            text = "".join(chr(int(c)) for c in cps)
            fast = T._basic_tokenize_fast(text, True, True)
            slow = tok._basic_tokenize_slow(text)
            assert fast == slow, (repr(text), fast, slow)


class TestBatchEncodeAny:
    """batch_encode_any must serve BOTH tokenizer families load_tokenizer
    can return (regression: the embed CLI crashed on BertTokenizerFast,
    which has no batch_encode method)."""

    def test_hf_fast_tokenizer(self, tmp_path):
        import numpy as np
        from transformers import BertTokenizerFast
        from czechtriever_tpu.data.tokenizer import batch_encode_any
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "praha", "brno", "kde", "je"]))
        tok = BertTokenizerFast(vocab_file=str(vocab), lowercase=True)
        ids, mask = batch_encode_any(tok, ["kde je praha", "brno"],
                                     max_length=16)
        assert ids.dtype == np.int32 and mask.dtype == np.int32
        assert ids.shape == mask.shape and ids.shape[0] == 2
        assert mask[0].sum() == 5          # CLS + 3 tokens + SEP
        assert mask[1].sum() == 3

    def test_native_tokenizer_same_interface(self, tmp_path):
        from czechtriever_tpu.data.tokenizer import (WordPieceTokenizer,
                                                     batch_encode_any)
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "praha", "brno", "kde", "je"]))
        tok = WordPieceTokenizer.from_vocab_file(str(vocab))
        ids, mask = batch_encode_any(tok, ["kde je praha", "brno"],
                                     max_length=16)
        assert ids.shape == mask.shape and ids.shape[0] == 2
        assert mask[0].sum() == 5 and mask[1].sum() == 3


class TestNativeWordPiece:
    """Native C++ batch tokenizer (native/wordpiece.cpp) — differential
    equality against the Python path, including the RISKY-text fallback
    (context-sensitive Greek sigma) and truncation/special-token
    semantics."""

    def _vocab(self):
        words = ("červená kočka skáče přes žlutou řeku a modrý pes běží "
                 "rychle dolů kolem zeleného stromu").split()
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                 + sorted(set(words))
                 + ["##ka", "##če", "če", "pes", "b", "##ěž", "##í",
                    ",", ".", "!", "中"])
        return {w: i for i, w in enumerate(dict.fromkeys(vocab))}

    def _texts(self):
        import numpy as np
        rng = np.random.default_rng(0)
        words = list(self._vocab())[5:20]
        texts = [" ".join(rng.choice(words, size=int(n)))
                 for n in rng.integers(3, 30, size=48)]
        return texts + ["", "  ", "červená, kočka! běží.", "x" * 150,
                        "中 kočka 中中", "PŘES ŽLUTOU",
                        "tab\tand\nnewline", "Σίσυφος kočka",
                        "neznáméslovo tady", "a" * 99 + " krátké"]

    @pytest.mark.parametrize("lower", [False, True])
    def test_matches_python_path(self, lower):
        from czechtriever_tpu.data import native_tokenizer as nt
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        if not nt.available():
            pytest.skip("no C++ toolchain")
        import numpy as np
        v = self._vocab()
        texts = self._texts()
        tok_n = WordPieceTokenizer(v, do_lower_case=lower)
        tok_p = WordPieceTokenizer(v, do_lower_case=lower)
        tok_p._native_batch = lambda *a, **k: None  # force Python
        for ml in (32, 512):
            a_ids, a_mask = tok_n.batch_encode(texts, max_length=ml)
            b_ids, b_mask = tok_p.batch_encode(texts, max_length=ml)
            np.testing.assert_array_equal(a_ids, b_ids)
            np.testing.assert_array_equal(a_mask, b_mask)

    def test_no_special_tokens_and_no_padding_paths(self):
        from czechtriever_tpu.data import native_tokenizer as nt
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        if not nt.available():
            pytest.skip("no C++ toolchain")
        import numpy as np
        v = self._vocab()
        tok = WordPieceTokenizer(v)
        tok_p = WordPieceTokenizer(v)
        tok_p._native_batch = lambda *a, **k: None
        texts = self._texts()
        a = tok.batch_encode(texts, max_length=16, add_special_tokens=False)
        b = tok_p.batch_encode(texts, max_length=16,
                               add_special_tokens=False)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
