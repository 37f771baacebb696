"""In-tree subword tokenizers (data/subword.py) vs HuggingFace's own
implementations loaded from the SAME local files — token-for-token and
id-for-id (the reference's tokenizer contract, run_PMR_ModCR.py:713-716,
775-777; no hub access anywhere)."""

import json

import pytest

from multimodal_context_reasoning_tpu.data.subword import (
    ByteBPETokenizer,
    WordPieceTokenizer,
    basic_tokenize,
    bytes_to_unicode,
    corpus_wordpiece_tokenizer,
    train_wordpiece,
)
from multimodal_context_reasoning_tpu.data.tokenization import (
    DET_TOKENS,
    HFTokenizer,
)

SAMPLES = [
    "A man is wearing a RED hat, and he's smiling!",
    "Why is <|det3|> pointing at <|det12|> ?",
    "naïve café — résumé…  (weird\tspacing)\n",
    "unaffable electroencephalography antidisestablishmentarianism",
    "numbers 1234 and 3.14159, $5.00!!",
    "汉字 mixed with English words",
    "",
    "   ",
    "[CLS] already-special [SEP]",
]

WORDS = (
    "a man is wearing red hat and he s smiling why pointing at the dog "
    "cat runs running runner jump jumped jumping un ##able affable "
    "electro graph numbers mixed with english words"
).split()


@pytest.fixture(scope="module")
def wp_vocab_file(tmp_path_factory):
    """A small but realistic WordPiece vocab covering chars + some units."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += [str(d) for d in range(10)] + ["##" + str(d) for d in range(10)]
    tokens += list(".,!?$()—…'\"-")
    tokens += [w for w in WORDS if w not in tokens]
    tokens += ["##ing", "##ed", "##er", "##s", "wear", "smil", "point"]
    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    path.write_text("\n".join(dict.fromkeys(tokens)) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    """vocab.json + merges.txt over the full byte alphabet plus a few
    realistic merges (space-prefixed English units, RoBERTa-style)."""
    byte_syms = list(bytes_to_unicode().values())
    merges = [
        ("Ġ", "t"), ("Ġ", "a"), ("h", "e"), ("i", "n"), ("r", "e"),
        ("Ġt", "he"), ("e", "r"), ("Ġa", "n"), ("Ġan", "d"),
        ("i", "s"), ("Ġ", "is"), ("in", "g"), ("Ġ", "w"),
        ("e", "a"), ("Ġw", "ea"), ("Ġwea", "r"), ("Ġwear", "ing"),
        ("a", "t"), ("Ġ", "h"), ("Ġh", "at"), ("1", "2"), ("12", "3"),
    ]
    vocab_tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"] + byte_syms + [
        a + b for a, b in merges
    ]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    d = tmp_path_factory.mktemp("bpe")
    vp, mp = d / "vocab.json", d / "merges.txt"
    vp.write_text(json.dumps(vocab), encoding="utf-8")
    mp.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vp), str(mp)


class TestWordPieceHFParity:
    @pytest.fixture(scope="class")
    def pair(self, wp_vocab_file):
        transformers = pytest.importorskip("transformers")
        hf = HFTokenizer(
            transformers.BertTokenizer(wp_vocab_file, do_lower_case=True)
        )
        mine = WordPieceTokenizer.from_vocab_file(wp_vocab_file)
        return hf, mine

    @pytest.mark.parametrize("text", SAMPLES)
    def test_tokens_and_ids_match(self, pair, text):
        hf, mine = pair
        t_hf, t_mine = hf.tokenize(text), mine.tokenize(text)
        assert t_hf == t_mine
        assert hf.convert_tokens_to_ids(t_hf) == mine.convert_tokens_to_ids(t_mine)

    def test_det_token_ids_match_added_token_assignment(self, pair):
        hf, mine = pair
        for t in (DET_TOKENS[0], DET_TOKENS[13], DET_TOKENS[44]):
            assert (hf.convert_tokens_to_ids([t])
                    == mine.convert_tokens_to_ids([t]))

    def test_long_word_is_unk(self, pair):
        hf, mine = pair
        w = "a" * 101
        assert hf.tokenize(w) == mine.tokenize(w) == ["[UNK]"]


class TestByteBPEHFParity:
    @pytest.fixture(scope="class")
    def pair(self, bpe_files):
        transformers = pytest.importorskip("transformers")
        vp, mp = bpe_files
        hf = HFTokenizer(transformers.RobertaTokenizer(vp, mp))
        mine = ByteBPETokenizer.from_files(vp, mp)
        return hf, mine

    @pytest.mark.parametrize("text", SAMPLES)
    def test_tokens_and_ids_match(self, pair, text):
        hf, mine = pair
        t_hf, t_mine = hf.tokenize(text), mine.tokenize(text)
        assert t_hf == t_mine
        assert hf.convert_tokens_to_ids(t_hf) == mine.convert_tokens_to_ids(t_mine)

    def test_pad_and_sentinels(self, pair, bpe_files):
        hf, mine = pair
        assert mine.pad_id == hf.pad_id == 1
        assert mine.cls_token == "<s>" and mine.sep_token == "</s>"

    def test_byte_fallback_never_unk(self, pair):
        """Byte-level BPE segments anything — exotic unicode included."""
        hf, mine = pair
        text = "Ω≈ç√∫ 🙂"
        assert hf.tokenize(text) == mine.tokenize(text)
        assert "<unk>" not in mine.tokenize(text)


class TestTrainedWordPiece:
    CORPUS = [
        "A man wearing a red hat is standing near the door .",
        "The woman in the blue coat is pointing at a small dog .",
        "He is smiling because the dog is jumping over the fence .",
        "Why is <|det3|> handing the book to <|det7|> ?",
        "Person standing near the window looks unhappy about the rain .",
    ] * 3

    def test_seen_words_have_no_unk_and_bounded_ids(self):
        tok = corpus_wordpiece_tokenizer(self.CORPUS, vocab_size=300)
        for text in self.CORPUS:
            toks = tok.tokenize(text)
            assert "[UNK]" not in toks, toks
            ids = tok.convert_tokens_to_ids(toks)
            assert max(ids) < len(tok)

    def test_distinct_words_get_distinct_encodings(self):
        """The property hash buckets lose: no two corpus words alias."""
        tok = corpus_wordpiece_tokenizer(self.CORPUS, vocab_size=300)
        seen = {}
        for w in {w for t in self.CORPUS for w in t.lower().split()
                  if w.isalpha()}:
            enc = tuple(tok.convert_tokens_to_ids(tok.tokenize(w)))
            assert enc not in seen or seen[enc] == w, (w, seen[enc])
            seen[enc] = w

    def test_roberta_style_conventions(self):
        tok = corpus_wordpiece_tokenizer(
            self.CORPUS, vocab_size=300, style="roberta")
        assert tok.cls_token == "<s>" and tok.sep_token == "</s>"
        assert tok.pad_id == 1
        assert tok.convert_tokens_to_ids(["<s>", "</s>"]) == [0, 2]

    def test_det_tokens_atomic_top_ids(self):
        tok = corpus_wordpiece_tokenizer(self.CORPUS, vocab_size=300)
        toks = tok.tokenize("look at <|det44|> now")
        assert "<|det44|>" in toks
        (i,) = tok.convert_tokens_to_ids(["<|det44|>"])
        assert i == len(tok) - 1

    def test_trainer_learns_frequent_units(self):
        vocab = train_wordpiece(self.CORPUS, vocab_size=300)
        # 'the' / 'ing' class units must have merged out of chars
        assert any(len(t) >= 3 and not t.startswith("##") and t.isalpha()
                   for t in vocab)

    def test_unseen_word_falls_back_to_pieces_not_unk(self):
        tok = corpus_wordpiece_tokenizer(self.CORPUS, vocab_size=300)
        toks = tok.tokenize("unhappiness")  # unseen but char-coverable
        assert toks and "[UNK]" not in toks

    def test_save_reload_roundtrip_both_styles(self, tmp_path):
        """Persisted corpus vocabs must reproduce identical ids on reload
        (checkpoints are servable only with their exact id space); the
        merges-less --roberta_vocab_file CLI path uses the roberta-style
        loader."""
        texts = self.CORPUS + ["watch <|det12|> hand <|det3|> the cup ."]
        for style, reload_fn in (
            ("bert", WordPieceTokenizer.from_vocab_file),
            ("roberta", WordPieceTokenizer.from_roberta_style_vocab_file),
        ):
            tok = corpus_wordpiece_tokenizer(texts, vocab_size=300,
                                             style=style)
            path = tmp_path / f"{style}_vocab.txt"
            tok.save_vocab_file(str(path))
            back = reload_fn(str(path))
            assert len(back) == len(tok)
            assert back.pad_id == tok.pad_id
            for t in texts:
                toks = tok.tokenize(t)
                assert back.tokenize(t) == toks
                assert (back.convert_tokens_to_ids(toks)
                        == tok.convert_tokens_to_ids(toks))

    def test_cli_loader_accepts_mergesless_roberta_vocab(self, tmp_path):
        import argparse

        from multimodal_context_reasoning_tpu.cli.common import (
            load_tokenizers,
        )
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig

        tok = corpus_wordpiece_tokenizer(self.CORPUS, vocab_size=300,
                                         style="roberta")
        path = tmp_path / "roberta_vocab.txt"
        tok.save_vocab_file(str(path))
        args = argparse.Namespace(
            bert_vocab_file="", bert_tokenizer_dir="",
            roberta_vocab_file=str(path), roberta_merges_file="",
            roberta_tokenizer_dir="")
        _, rob = load_tokenizers(args, ModCRConfig.tiny())
        text = self.CORPUS[0]
        assert rob.tokenize(text) == tok.tokenize(text)
        assert rob.convert_tokens_to_ids(rob.tokenize(text)) == \
            tok.convert_tokens_to_ids(tok.tokenize(text))

    def test_singleton_words_do_not_stall_training(self):
        """Round-5 regression: likelihood scoring ranks RARE pairs highest,
        so a corpus with singleton words made the old ``bf < min_pair_freq``
        STOP condition fire on the first iteration — training ended after
        ~one merge and every word tokenized to characters (vocab ~150 at a
        budget of 8192, 3.7x sequence expansion on real PMR).  The floor
        must filter candidacy, not stop training."""
        # unrepeated corpus: plenty of frequency-1 words/pairs, like real
        # data (the ×3-repeated CORPUS above never exposed the bug)
        corpus = self.CORPUS[:5] + [
            f"bystander number {i} gesticulates inexplicably ." for i in range(4)
        ] + ["a quixotic zephyr vexes the jovial banker ."]
        vocab = train_wordpiece(corpus, vocab_size=500)
        multi = [t for t in vocab
                 if len(t.lstrip("#")) >= 3 and not t.startswith("##")]
        assert len(multi) >= 20, (
            f"trainer stalled: only {len(multi)} multi-char units "
            f"in a {len(vocab)}-entry vocab")
        tok = corpus_wordpiece_tokenizer(corpus, vocab_size=500)
        # frequent words must not shatter to characters
        assert len(tok.tokenize("the")) <= 2
        pieces = tok.tokenize("standing near the door")
        assert len(pieces) <= 8, pieces


class TestBasicTokenize:
    def test_cjk_and_accents(self):
        assert basic_tokenize("汉字abc") == ["汉", "字", "abc"]
        assert basic_tokenize("café") == ["cafe"]
        assert basic_tokenize("Héllo, WORLD!") == ["hello", ",", "world", "!"]

    def test_control_chars_removed(self):
        assert basic_tokenize("a\x00b�c") == ["abc"]
