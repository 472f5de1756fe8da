"""Script-aware language ID (textops.language_id_v2, round 6).

Goldens over real sentences in nine non-Latin writing systems + four
Latin stopword languages, plus the decision-rule edge cases: the kana
1% rule separating Japanese from Chinese, the 30% script threshold,
mixed-script text, and the und fallbacks.
"""

import pandas as pd
import pytest

from ironspark.textops import language_id_v2

GOLDENS = [
    # (text, expected)
    ("the quick brown fox jumps over the lazy dog and it is fine", "en"),
    ("der alte mann ist nicht mit dem zug und das war auch gut so", "de"),
    ("le monde est grand et la mer est belle dans les pays que nous aimons", "fr"),
    ("el sol y la luna son los astros con los que vivimos para siempre", "es"),
    ("机器学习模型需要大量的训练数据才能取得良好的效果", "zh"),
    ("機械学習のモデルにはたくさんの学習データが必要です", "ja"),
    ("기계 학습 모델은 많은 훈련 데이터가 필요합니다", "ko"),
    ("модели машинного обучения требуют большого количества данных", "ru"),
    ("تحتاج نماذج التعلم الآلي إلى كمية كبيرة من البيانات", "ar"),
    ("मशीन लर्निंग मॉडल को बहुत सारे डेटा की आवश्यकता होती है", "hi"),
    ("τα μοντέλα μηχανικής μάθησης χρειάζονται πολλά δεδομένα", "el"),
    ("โมเดลการเรียนรู้ของเครื่องต้องการข้อมูลจำนวนมาก", "th"),
    ("מודלים של למידת מכונה זקוקים להרבה נתונים", "he"),
    ("9731 8462 5019 2784 6203", "und"),
    # round 6: the three Latin languages added to STOPWORDS
    ("il mare e bello e anche il sole che vediamo nel cielo sono della natura", "it"),
    ("het weer is mooi en we gaan met de fiets van het huis naar een park om ook niet te laat te zijn", "nl"),
    ("a cidade tem uma praia bonita e vamos para ela com os amigos de manha para ver mais do mar", "pt"),
]


def _run(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(rows)), "text": [t for t, _ in rows]}
        )
    )
    out = {r.doc_id: r for r in language_id_v2(df).collect()}
    return [(rows[i][0], rows[i][1], out[i].lang_guess) for i in range(len(rows))]


def test_goldens_all_scripts(spark):
    for text, want, got in _run(spark, GOLDENS):
        assert got == want, f"{text[:30]!r}: want {want}, got {got}"


def test_kana_rule_separates_ja_from_zh(spark):
    rows = [
        # pure Han -> zh even though Japanese also uses Han
        ("漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字", "zh"),
        # mostly Han with a little kana (>=1% of chars) -> ja
        ("漢字漢字漢字漢字漢字漢字漢字漢字漢字の", "ja"),
    ]
    for text, want, got in _run(spark, rows):
        assert got == want, f"{text[:20]!r}: want {want}, got {got}"


def test_threshold_and_mixed_script(spark):
    rows = [
        # 30%-of-non-space threshold: a couple of Cyrillic chars inside
        # an English sentence must NOT flip the guess
        ("the report about федор was long and it was the best of the year", "en"),
        # majority Cyrillic with a Latin brand name -> ru
        ("сегодня мы читаем новости на сайте bbc вместе с друзьями", "ru"),
    ]
    for text, want, got in _run(spark, rows):
        assert got == want, f"{text[:30]!r}: want {want}, got {got}"


def test_und_fallbacks(spark):
    rows = [
        ("", "und"),
        ("zzz qqq xxx www", "und"),  # Latin but zero stopword hits
    ]
    for text, want, got in _run(spark, rows):
        assert got == want, f"{text!r}: want {want}, got {got}"


def test_counts_columns_exposed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["机器 学习 models"]})
    )
    r = language_id_v2(df).collect()[0]
    assert r.n_script_chars == 4  # four Han chars
    assert r.n_nonspace == 10  # 4 Han + 'models' (6)
