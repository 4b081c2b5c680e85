"""Bar datasets: monophonic measures on a 24-tick grid.

Re-implements the capability of the reference
``data/dataloaders/bar_dataset.py`` (1044 LoC of music21 pipeline):
token vocabularies persisted in the same two-line repr text format
(``bar_dataset.py:47-54``), score↔tensor conversion on the
6-subdivisions/beat grid, bar splitting, transposition augmentation,
START/END window padding, and the attribute extractors (delegated to
the tensorized :mod:`arvae_tpu.data.attributes`).

Corpus sources, in priority order:
1. If ``folk_raw_data/`` holds .abc files they are ingested with the
   native ABC parser (:mod:`arvae_tpu.data.abc_parser`) through the
   reference's validity pipeline (file-list cache, 25k cap, shuffle).
2. Otherwise a deterministic synthetic folk/chorale corpus is
   generated: monophonic tunes with metrically-weighted onset
   patterns and bounded random-walk melodies in the reference's
   [55, 84] pitch range — the full tensor pipeline (vocab build,
   transposition, windowing, caching) is identical either way.

Scores are lightweight note-event lists (see ``Score``) rather than
music21 streams; MIDI artifacts go through
:mod:`arvae_tpu.utils.midi`.
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from arvae_tpu.data.attributes import MusicAttributes
from arvae_tpu.data.loaders import EpochLoader, datasets_root
from arvae_tpu.data.music_theory import (
    END_SYMBOL,
    REST_SYMBOL,
    SLUR_SYMBOL,
    START_SYMBOL,
    TICK_DURATIONS,
    TICKS_PER_MEASURE,
    midi_to_note_name,
    note_name_to_midi,
)


@dataclass
class Score:
    """A monophonic score as (pitch, start_quarters, dur_quarters) events;
    pitch -1 denotes a rest."""

    notes: List[Tuple[int, float, float]] = field(default_factory=list)

    @property
    def highest_time(self) -> float:
        return max((s + d for _, s, d in self.notes), default=0.0)

    def write_midi(self, path: str) -> None:
        from arvae_tpu.utils.midi import write_midi

        write_midi(self.notes, path)

    # music21-API-compatible alias (reference: score.write('midi', fp=...))
    def write(self, fmt: str, fp: str) -> None:
        assert fmt == "midi"
        self.write_midi(fp)


class BarDataset:
    """Abstract base (reference bar_dataset.py:19-542)."""

    def __init__(
        self,
        time_sig_num: int = 4,
        time_sig_den: int = 4,
        dataset_type: str = "train",
        is_short: bool = False,
        raw_datapath: Optional[str] = None,
    ):
        del raw_datapath  # consumed by corpus-backed subclasses
        self.pitch_range = [55, 84]
        self.dataset_type = dataset_type
        self.is_short = is_short
        self.time_sig_num = time_sig_num
        self.time_sig_den = time_sig_den
        self.time_sig_str = f"{time_sig_num}by{time_sig_den}"
        self.beat_subdivisions = len(TICK_DURATIONS)
        self.tick_durations = TICK_DURATIONS
        self.class_name: Optional[str] = None
        self.dataset_dir_path = datasets_root()
        self.note2index_dicts: Optional[Dict] = None
        self.index2note_dicts: Optional[Dict] = None
        self._attrs: Optional[MusicAttributes] = None
        self._dataset_cache = None

    def __repr__(self):
        return self.class_name

    # -- vocab persistence (reference bar_dataset.py:47-54, 579-608) -------

    @property
    def vocab_name(self) -> str:
        """Vocabulary identity: one vocab per corpus/time-signature (all
        n-bar variants of a corpus share note names)."""
        style = getattr(self, "style", "bar")
        return f"{self.time_sig_str}_{style}_"

    @property
    def dict_path(self) -> str:
        return os.path.join(
            self.dataset_dir_path, self.vocab_name + "index_dicts.txt"
        )

    def update_index_dicts(self) -> None:
        os.makedirs(self.dataset_dir_path, exist_ok=True)
        with open(self.dict_path, "w") as f:
            f.write("%s\n" % self.index2note_dicts)
            f.write("%s\n" % self.note2index_dicts)

    def read_index_dicts(self) -> bool:
        if not os.path.exists(self.dict_path):
            return False
        with open(self.dict_path) as f:
            dicts = [line.rstrip("\n") for line in f]
        assert len(dicts) == 2
        # literal_eval replaces the reference's eval() (bar_dataset.py:585)
        self.index2note_dicts = ast.literal_eval(dicts[0])
        self.note2index_dicts = ast.literal_eval(dicts[1])
        return True

    def _token_index(self, name: str) -> int:
        """Token id for a note name, growing the vocabulary on unseen
        names like the reference's get_tensor (bar_dataset.py:89-99).
        On a miss the dict file is re-read first, so growth merges with
        entries another dataset object sharing this vocab file may have
        appended since (train/test pairs and the bar/n-bar variants all
        share one file per corpus/time-signature); every mutation is
        persisted immediately, so disk ⊇ memory always holds."""
        idx = self.note2index_dicts.get(name)
        if idx is not None:
            return idx
        if os.path.exists(self.dict_path):
            self.read_index_dicts()
            self._attrs = None
            idx = self.note2index_dicts.get(name)
            if idx is not None:
                return idx
        new_index = len(self.note2index_dicts)
        self.index2note_dicts[new_index] = name
        self.note2index_dicts[name] = new_index
        print(f"Warning: Entry {{{new_index}: {name!r}}} added to "
              "dictionaries")
        self.update_index_dicts()
        self._attrs = None
        return new_index

    def build_vocab(self, note_names: Sequence[str]) -> None:
        """Vocabulary from a name set + specials
        (reference bar_dataset.py:589-608; insertion order stands in for
        the reference's nondeterministic set iteration)."""
        names = [SLUR_SYMBOL, START_SYMBOL, END_SYMBOL, REST_SYMBOL]
        for n in note_names:
            if n not in names:
                names.append(n)
        self.index2note_dicts = {i: n for i, n in enumerate(names)}
        self.note2index_dicts = {n: i for i, n in enumerate(names)}
        self.update_index_dicts()

    @property
    def attrs(self) -> MusicAttributes:
        if self._attrs is None:
            self._attrs = MusicAttributes(self.index2note_dicts)
        return self._attrs

    # -- score <-> tensor (reference bar_dataset.py:65-133, 224-254) --------

    def score_to_tensor(self, score: Score) -> Optional[np.ndarray]:
        """Rasterizes a score onto the tick grid: a token at each onset
        tick, SLUR on continuations (reference get_tensor,
        bar_dataset.py:65-117)."""
        # highest_time is in quarters; 6 ticks per quarter-note beat
        length = int(round(score.highest_time * self.beat_subdivisions))
        if length == 0:
            return None
        tokens = np.full((length,), self.note2index_dicts[SLUR_SYMBOL],
                         dtype=np.int64)
        for pitch, start, dur in score.notes:
            tick = onset_tick(start, self.beat_subdivisions)
            if tick >= length:
                continue
            name = REST_SYMBOL if pitch < 0 else midi_to_note_name(pitch)
            tokens[tick] = self._token_index(name)
        return tokens[None, :]

    def split_tensor_to_bars(self, score_tensor: np.ndarray) -> np.ndarray:
        """(1, L) → (num_bars, 24) (reference bar_dataset.py:119-133)."""
        assert score_tensor.shape[0] == 1
        bar_len = self.beat_subdivisions * self.time_sig_num
        num_bars = score_tensor.shape[1] // bar_len
        return score_tensor[0, : num_bars * bar_len].reshape(num_bars, bar_len)

    def tensor_to_m21score(self, tensor_score: np.ndarray) -> Score:
        """Token row(s) → Score (reference bar_dataset.py:224-254)."""
        slur_index = self.note2index_dicts[SLUR_SYMBOL]
        flat = np.asarray(tensor_score).reshape(-1)
        notes: List[Tuple[int, float, float]] = []
        cur_pitch = None
        cur_start = 0.0
        t = 0.0
        for tick_index, note_index in enumerate(flat):
            dur = float(TICK_DURATIONS[tick_index % self.beat_subdivisions])
            if note_index != slur_index:
                if cur_pitch is not None:
                    notes.append((cur_pitch, cur_start, t - cur_start))
                name = self.index2note_dicts[int(note_index)]
                midi = note_name_to_midi(name)
                cur_pitch = midi if midi is not None else -1
                cur_start = t
            t += dur
        if cur_pitch is not None:
            notes.append((cur_pitch, cur_start, t - cur_start))
        return Score(notes=notes)

    def concatenate_scores(self, scores_list: List[Score]) -> Score:
        """Back-to-back measures, 4 quarters apart
        (reference bar_dataset.py:256-268)."""
        out = Score()
        offset = 0.0
        for s in scores_list:
            for p, st, d in s.notes:
                out.notes.append((p, offset + st, d))
            offset += 4.0
        return out

    # -- padding / transposition (reference bar_dataset.py:270-335) ---------

    def get_tensor_with_padding(
        self, tensor: np.ndarray, start_tick: int, end_tick: int
    ) -> np.ndarray:
        assert start_tick < end_tick
        batch, length = tensor.shape
        parts = []
        if start_tick < 0:
            parts.append(
                np.full((batch, -start_tick),
                        self.note2index_dicts[START_SYMBOL], dtype=np.int64)
            )
        s = max(start_tick, 0)
        e = min(end_tick, length)
        parts.append(tensor[:, s:e])
        if end_tick > length:
            parts.append(
                np.full((batch, end_tick - length),
                        self.note2index_dicts[END_SYMBOL], dtype=np.int64)
            )
        return np.concatenate(parts, axis=1)

    def empty_score_tensor(self, score_length: int) -> np.ndarray:
        return np.full((1, score_length), self.note2index_dicts[SLUR_SYMBOL],
                       dtype=np.int64)

    # -- attribute extractor API (reference bar_dataset.py:337-542) ---------

    def _np(self, x) -> np.ndarray:
        return np.asarray(x)

    def get_note_density_in_measure(self, measure_tensor):
        return np.asarray(self.attrs.note_density(self._np(measure_tensor)))

    def get_pitch_range_in_measure(self, measure_tensor):
        return np.asarray(self.attrs.pitch_range(self._np(measure_tensor)))

    def get_rhy_complexity(self, measure_tensor):
        return np.asarray(self.attrs.rhy_complexity(self._np(measure_tensor)))

    def get_contour(self, measure_tensor):
        return np.asarray(self.attrs.contour(self._np(measure_tensor)))

    def get_beat_strength(self, measure_tensor):
        return np.asarray(self.attrs.beat_strength(self._np(measure_tensor)))

    def get_rhythmic_entropy(self, measure_tensor):
        return np.asarray(self.attrs.rhythmic_entropy(self._np(measure_tensor)))

    def get_interval_entropy(self, measure_tensor):
        return np.asarray(self.attrs.interval_entropy(self._np(measure_tensor)))

    # -- loaders (reference bar_dataset.py:179-222) --------------------------

    def get_dataset(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._dataset_cache is None:
            self._dataset_cache = self.make_dataset()
        return self._dataset_cache

    def make_dataset(self):
        raise NotImplementedError

    def data_loaders(self, batch_size: int, split=(0.85, 0.10)):
        score, metadata = self.get_dataset()
        assert sum(split) < 1
        n = len(score)
        a, b = split
        i0, i1 = int(a * n), int((a + b) * n)
        mk = lambda sl, shuf: EpochLoader(
            (score[sl], metadata[sl]), batch_size, shuffle=shuf,
            drop_last=True, seed=0,
        )
        return (
            mk(slice(0, i0), True),
            mk(slice(i0, i1), False),
            mk(slice(i1, n), False),
        )

    def device_splits(self, ctx, split=(0.70, 0.20)):
        """Device-resident (train, val) token splits (per-measure rows
        reshaped from n-bar windows; see arvae_tpu.data.device_data)."""
        from arvae_tpu.data.device_data import DeviceSplit

        score, _ = self.get_dataset()
        n = len(score)
        a, b = split
        i0, i1 = int(a * n), int((a + b) * n)

        def mk(sl):
            rows = np.asarray(score[sl], np.int32)
            rows = rows.reshape(-1, TICKS_PER_MEASURE)
            # labels ARE the score: one HBM copy, one gather collective
            return DeviceSplit(rows, None, (TICKS_PER_MEASURE,), "tokens",
                               ctx)

        return mk(slice(0, i0)), mk(slice(i0, i1))

    def device_eval_split(self, ctx, split=(0.85, 0.10)):
        """Device-resident EVAL split (data_loaders()[2] semantics)."""
        from arvae_tpu.data.device_data import DeviceSplit

        score, _ = self.get_dataset()
        n = len(score)
        i1 = int(sum(split) * n)
        rows = np.asarray(score[i1:], np.int32).reshape(-1, TICKS_PER_MEASURE)
        return DeviceSplit(rows, None, (TICKS_PER_MEASURE,), "tokens", ctx)


# ---------------------------------------------------------------------------
# Synthetic corpus generation
# ---------------------------------------------------------------------------

# Onset probability per tick position within a beat (strong beats first)
_FOLK_ONSET_P = np.tile([0.95, 0.08, 0.12, 0.45, 0.12, 0.25], 4)
_CHORALE_ONSET_P = np.tile([0.97, 0.02, 0.03, 0.30, 0.03, 0.08], 4)


def generate_synthetic_tune(
    rng: np.random.RandomState,
    num_measures: int,
    style: str = "folk",
) -> np.ndarray:
    """One tune as (midi-or-codes,) per tick: >=0 pitch onset, -1 slur
    (continuation), -2 rest onset."""
    onset_p = _FOLK_ONSET_P if style == "folk" else _CHORALE_ONSET_P
    lo, hi = 57, 82  # leave transposition headroom inside [55, 84]
    T = num_measures * TICKS_PER_MEASURE
    out = np.full((T,), -1, dtype=np.int64)
    pitch = rng.randint(lo + 5, hi - 5)
    step_choices = np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
    step_p = np.array([2, 3, 6, 12, 20, 20, 12, 6, 3, 2], dtype=np.float64)
    step_p /= step_p.sum()
    for t in range(T):
        if rng.rand() < onset_p[t % TICKS_PER_MEASURE]:
            if rng.rand() < 0.06:
                out[t] = -2  # rest
                continue
            pitch = pitch + rng.choice(step_choices, p=step_p)
            pitch = int(np.clip(pitch, lo, hi))
            out[t] = pitch
    # guarantee the tune opens with a note
    if out[0] < 0:
        out[0] = pitch
    return out


def _tune_token_names(tune: np.ndarray, shift: int = 0) -> List[str]:
    names = []
    for v in tune:
        if v == -1:
            names.append(SLUR_SYMBOL)
        elif v == -2:
            names.append(REST_SYMBOL)
        else:
            names.append(midi_to_note_name(int(v) + shift))
    return names


_TICK_STARTS = np.cumsum([0.0] + [float(d) for d in TICK_DURATIONS])


def onset_tick(start: float, beat_subdivisions: int) -> int:
    """Snaps a note onset (quarter-note units) to its tick index — the
    one grid-snapping rule shared by ``score_to_tensor`` and
    ``score_to_tick_codes``."""
    beat, frac = divmod(start, 1.0)
    tick_in_beat = int(np.argmin(np.abs(_TICK_STARTS[:-1] - frac)))
    return int(beat) * beat_subdivisions + tick_in_beat


def score_to_tick_codes(score: Score, beat_subdivisions: int = 6
                        ) -> Optional[np.ndarray]:
    """Score → per-tick code array: ≥0 MIDI onset, -1 slur continuation,
    -2 rest onset (the internal 'tune' representation)."""
    length = int(round(score.highest_time * beat_subdivisions))
    if length == 0:
        return None
    codes = np.full((length,), -1, dtype=np.int64)
    for pitch, start, _ in score.notes:
        tick = onset_tick(start, beat_subdivisions)
        if tick >= length:
            continue
        codes[tick] = -2 if pitch < 0 else int(pitch)
    return codes


class FolkBarDataset(BarDataset):
    """Single-measure folk dataset (reference bar_dataset.py:732-931).

    Corpus source: if ``folk_raw_data/`` holds .abc files they are
    ingested with the native ABC parser (validity pipeline identical to
    the reference's, file list cached as ``<ts>valid_filelist.txt``);
    otherwise the deterministic synthetic corpus is generated.
    """

    style = "folk"
    n_tunes_full = 150
    n_tunes_short = 20

    def __init__(self, time_sig_num=4, time_sig_den=4, dataset_type="train",
                 is_short=False, raw_datapath: Optional[str] = None):
        super().__init__(time_sig_num, time_sig_den, dataset_type, is_short)
        self.class_name = f"{self.time_sig_str}_{type(self).__name__}_"
        self.raw_datapath = raw_datapath or os.path.join(
            os.getcwd(), "folk_raw_data"
        )
        self.max_num_files = 20 if is_short else 25000
        self._tunes: Optional[List[np.ndarray]] = None
        self._init_vocab()

    # -- corpus ---------------------------------------------------------------

    def _abc_files(self) -> List[str]:
        if self.style != "folk" or not os.path.isdir(self.raw_datapath):
            return []
        return sorted(
            os.path.join(self.raw_datapath, f)
            for f in os.listdir(self.raw_datapath)
            if f.endswith(".abc")
        )

    def _valid_abc_files(self) -> List[str]:
        """Validated file list, cached like the reference
        (bar_dataset.py:761-790). The cache always holds the FULL valid
        list and ``max_num_files`` is applied by the reader — the
        reference also caps while *building* the cache (``:871-873``),
        which poisons later full runs with a short run's 20-file list;
        capability reproduced, bug not cloned."""
        from arvae_tpu.data.abc_parser import is_valid_folk_tune

        os.makedirs(self.dataset_dir_path, exist_ok=True)
        cache = os.path.join(
            self.dataset_dir_path, self.time_sig_str + "valid_filelist.txt"
        )
        if os.path.exists(cache):
            with open(cache) as f:
                return [
                    os.path.join(self.raw_datapath, line.rstrip("\n"))
                    for line in f if line.strip()
                ]
        valid = [
            path for path in self._abc_files()
            if is_valid_folk_tune(path, (self.time_sig_num,
                                         self.time_sig_den))
        ]
        with open(cache, "w") as f:
            for p in valid:
                f.write(os.path.basename(p) + "\n")
        return valid

    def _corpus_all_tunes(self) -> List[np.ndarray]:
        """Every tune of the corpus (both splits), parsed ONCE per
        dataset object — the vocab pass and both split views share this
        cache so a real 25k-file corpus is not re-parsed per split."""
        if getattr(self, "_all_tunes_cache", None) is not None:
            return self._all_tunes_cache
        abc_files = self._abc_files()
        if abc_files:
            from arvae_tpu.data.abc_parser import parse_abc_file

            files = self._valid_abc_files()
            order = np.random.RandomState(0).permutation(len(files))
            # cap AFTER the shuffle (reference bar_dataset.py:787-789):
            # 20 files for --short, the reference's 25000 ceiling
            # otherwise — independent of which mode built the cache
            files = [files[i] for i in order][: self.max_num_files]
            tunes = []
            for p in files:
                try:
                    _, score = parse_abc_file(p)
                except Exception:
                    continue
                codes = score_to_tick_codes(score, self.beat_subdivisions)
                if codes is not None:
                    tunes.append(codes)
        else:
            n = self.n_tunes_short if self.is_short else self.n_tunes_full
            rng = np.random.RandomState(1234 if self.style == "folk" else 4321)
            tunes = [
                generate_synthetic_tune(
                    rng, num_measures=int(rng.randint(8, 17)),
                    style=self.style,
                )
                for _ in range(n)
            ]
        self._all_tunes_cache = tunes
        return tunes

    def _corpus_tunes(self) -> List[np.ndarray]:
        """All tunes of the split, as per-tick code arrays."""
        if self._tunes is not None:
            return self._tunes
        tunes = self._corpus_all_tunes()
        n_train = int(0.9 * len(tunes))
        if self.dataset_type == "train":
            self._tunes = tunes[:n_train]
        else:
            self._tunes = tunes[n_train:]
        return self._tunes

    def _init_vocab(self) -> None:
        if self.read_index_dicts():
            return
        # names over all tunes AND all transpositions, so augmentation
        # never triggers dynamic vocab growth
        names: List[str] = []
        for tune in self._all_split_tunes():
            for shift in self._transposition_shifts(tune):
                for nm in set(_tune_token_names(tune, shift)):
                    if nm not in names:
                        names.append(nm)
        self.build_vocab(sorted(set(names) - {SLUR_SYMBOL, REST_SYMBOL}))

    def _all_split_tunes(self) -> List[np.ndarray]:
        return self._corpus_all_tunes()

    def _transposition_shifts(self, tune: np.ndarray) -> List[int]:
        """All semitone shifts keeping the tune inside pitch_range
        (reference all_transposition_intervals, bar_dataset.py:270-289)."""
        pitches = tune[tune >= 0]
        if len(pitches) == 0:
            return [0]
        lo, hi = int(pitches.min()), int(pitches.max())
        return list(range(self.pitch_range[0] - lo,
                          self.pitch_range[1] - hi + 1))

    def _tokens(self, tune: np.ndarray, shift: int = 0) -> np.ndarray:
        """Token ids for one tune — a real corpus can contain pitches
        outside the span a cached vocab file registers, and those grow
        the vocabulary (``_token_index``) rather than KeyError."""
        return np.array(
            [self._token_index(nm) for nm in _tune_token_names(tune, shift)],
            dtype=np.int64,
        )

    # -- dataset --------------------------------------------------------------

    @property
    def dataset_path(self) -> str:
        sfx = "_short" if self.is_short else ""
        return os.path.join(
            self.dataset_dir_path,
            self.class_name + self.dataset_type + sfx + ".npz",
        )

    def make_dataset(self):
        if os.path.exists(self.dataset_path):
            data = np.load(self.dataset_path)
            return data["score"], data["metadata"]
        bars = []
        for tune in self._corpus_tunes():
            bars.append(self.split_tensor_to_bars(self._tokens(tune)[None, :]))
        if sum(b.shape[0] for b in bars) == 0:
            # covers both no tunes at all and all-sub-measure tunes
            # (split_tensor_to_bars yields (0, 24) for those)
            raise ValueError(
                f"corpus produced no {self.dataset_type!r} bars — too few "
                "valid files for a 90/10 split (need at least 2), or every "
                "tune is shorter than one measure"
            )
        score = np.concatenate(bars, 0)
        os.makedirs(self.dataset_dir_path, exist_ok=True)
        np.savez_compressed(self.dataset_path, score=score, metadata=score)
        print("Dataset Size: ", score.shape)
        return score, score


class ChoraleBarDataset(FolkBarDataset):
    """Chorale-style single-measure dataset
    (reference bar_dataset.py:545-639; synthetic chorale style here)."""

    style = "chorale"
    n_tunes_full = 120
    n_tunes_short = 10


class FolkNBarDataset(FolkBarDataset):
    """n-bar windows with transposition augmentation and START/END
    padding (reference bar_dataset.py:933-1024)."""

    def __init__(self, time_sig_num=4, time_sig_den=4, dataset_type="train",
                 is_short=False, num_bars=16,
                 raw_datapath: Optional[str] = None):
        self.n_bars = num_bars  # needed by class_name before super().__init__
        super().__init__(time_sig_num, time_sig_den, dataset_type, is_short,
                         raw_datapath=raw_datapath)
        self.class_name = (
            f"{self.time_sig_str}_{type(self).__name__}_{self.n_bars}_"
        )
        self.num_beats_per_bar = time_sig_num
        self.seq_size_in_beats = self.num_beats_per_bar * self.n_bars

    def make_dataset(self):
        if os.path.exists(self.dataset_path):
            data = np.load(self.dataset_path)
            return data["score"], data["metadata"]
        windows = []
        seq_ticks = self.seq_size_in_beats * self.beat_subdivisions
        for tune in self._corpus_tunes():
            for shift in self._transposition_shifts(tune):
                tokens = self._tokens(tune, shift)[None, :]
                total_beats = tokens.shape[1] // self.beat_subdivisions
                for off in range(-self.num_beats_per_bar, total_beats,
                                 self.seq_size_in_beats):
                    win = self.get_tensor_with_padding(
                        tokens,
                        off * self.beat_subdivisions,
                        off * self.beat_subdivisions + seq_ticks,
                    )
                    windows.append(win)
        if not windows:
            raise ValueError(
                f"corpus produced no {self.dataset_type!r} windows — too "
                "few valid tunes (or every tune's pitch span exceeds the "
                f"{self.pitch_range} transposition range)"
            )
        score = np.concatenate(windows, 0)
        os.makedirs(self.dataset_dir_path, exist_ok=True)
        np.savez_compressed(self.dataset_path, score=score, metadata=score)
        print("Dataset Size: ", score.shape)
        return score, score


class ChoraleNBarDataset(FolkNBarDataset):
    """n-bar chorale windows (reference bar_dataset.py:642-729)."""

    style = "chorale"
    n_tunes_full = 120
    n_tunes_short = 10
