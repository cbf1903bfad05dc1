package graft.ct

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Registrable ("base") domain via the Public Suffix List algorithm —
  * the engine-side equivalent of the reference's
  * `psl.get_public_suffix(d)` (/root/reference/ingestion/ct_ingestor.py:39,146-147).
  *
  * Semantics pinned to the reference library's observable behavior
  * (SURVEY §7.4): returns the registrable domain (`a.b.example.co.uk` →
  * `example.co.uk`); for a bare public suffix or single label the input's
  * suffix itself is returned. Matching is case-insensitive; output is
  * lowercase.
  *
  * Ships an embedded subset of the PSL (zero-egress build; the full
  * `public_suffix_list.dat` can be dropped in via `loadRules`). Exact,
  * wildcard (`*.ck`) and exception (`!www.ck`) rules are all supported, so
  * swapping in the full list is a data change only.
  */
object PublicSuffix extends Serializable {

  /** Embedded PSL rule set — a curated ~500-rule subset of the public
    * `public_suffix_list.dat` (ICANN + private sections), assembled from
    * public knowledge because the build is zero-egress. Covers every gTLD/
    * ccTLD family the CT corpus commonly hits, the major ccTLD second- and
    * third-level registries, wildcard and exception rules, IDN ccTLDs, and
    * the big hosted-platform private registries (github.io class). The
    * complete list remains a pure data drop-in via `loadRules`. */
  private val embeddedRules: Seq[String] = Seq(
    // ---- generic + sponsored TLDs ----
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz", "name",
    "pro", "aero", "asia", "cat", "coop", "jobs", "mobi", "museum", "post",
    "tel", "travel", "eu",
    // ---- common new gTLDs ----
    "io", "ai", "app", "dev", "page", "xyz", "online", "site", "tech",
    "store", "blog", "cloud", "me", "tv", "cc", "ws", "fm", "am", "gg",
    "im", "je", "ly", "sh", "so", "to", "vc", "la", "gl", "gs", "ms",
    "nu", "pw", "re", "st", "su", "tk", "tl", "top", "club", "vip",
    "wiki", "ink", "best", "bio", "black", "blue", "red", "green", "pink",
    "promo", "shop", "art", "design", "live", "life", "world", "today",
    "news", "agency", "digital", "email", "expert", "guru", "media",
    "network", "solutions", "systems", "tools", "zone", "works", "space",
    "website", "fun", "icu", "run", "codes", "computer", "finance",
    "capital", "cash", "money", "legal", "education", "academy", "school",
    "university", "institute", "training", "careers", "games", "studio",
    "directory", "email", "group", "host", "hosting", "land", "estate",
    "one", "plus", "pub", "rocks", "sale", "services", "show", "social",
    "software", "team", "video", "watch", "wtf",
    // ---- ccTLDs with flat (single-label) registration ----
    "de", "fr", "it", "es", "nl", "pl", "ru", "ua", "se", "no", "fi", "dk",
    "ch", "at", "be", "cz", "sk", "hu", "ro", "bg", "gr", "pt", "ie", "lt",
    "lv", "ee", "hr", "si", "ba", "mk", "al", "is", "lu", "li", "mt", "cy",
    "tr", "il", "in", "cn", "jp", "kr", "au", "nz", "za", "br", "mx", "ar",
    "ca", "us", "uk", "cl", "co", "pe", "ec", "ve", "uy", "py", "bo", "cr",
    "do", "gt", "hn", "ni", "pa", "pr", "sv", "cu", "md", "ge", "az", "by",
    "kz", "kg", "uz", "tm", "tj", "mn", "af", "iq", "ir", "sy", "jo", "lb",
    "ae", "sa", "qa", "kw", "bh", "om", "ye", "eg", "ma", "dz", "tn", "ly",
    "sd", "ng", "gh", "ke", "tz", "ug", "et", "zm", "zw", "mw", "mz", "na",
    "bw", "sn", "ci", "cm", "ga", "cd", "ao", "rw", "mg", "mu", "sc", "my",
    "sg", "th", "vn", "ph", "id", "pk", "bd", "lk", "mm", "kh", "la", "bn",
    "hk", "tw", "mo", "np", "fj", "pg", "sb", "vu", "ws", "as", "ad", "mc",
    "sm", "va", "gi", "fo", "gl", "ax", "rs", "xk",
    // ---- UK ----
    "co.uk", "org.uk", "me.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk", "nhs.uk", "police.uk",
    // ---- Australia / New Zealand / Pacific ----
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz", "geek.nz",
    "gen.nz", "maori.nz", "iwi.nz",
    "com.fj", "com.pg", "com.sb",
    // ---- Japan / Korea / Greater China ----
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr", "mil.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr", "busan.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "bj.cn", "sh.cn", "gd.cn", "zj.cn", "js.cn",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "game.tw",
    "ebiz.tw", "club.tw",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    // ---- South / Southeast Asia ----
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "mil.in", "nic.in", "res.in",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "ngo.ph",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "mil.id",
    "net.id", "my.id", "biz.id",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "gok.pk", "gob.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    "com.lk", "org.lk", "edu.lk", "gov.lk", "net.lk", "int.lk", "ac.lk",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "mil.kh", "per.kh",
    "com.bn", "edu.bn", "gov.bn", "net.bn", "org.bn",
    "com.np", "edu.np", "gov.np", "net.np", "org.np", "mil.np",
    // ---- Middle East / Africa ----
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "k12.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    "com.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa", "mil.qa", "sch.qa",
    "com.kw", "net.kw", "org.kw", "edu.kw", "gov.kw",
    "com.bh", "net.bh", "org.bh", "edu.bh", "gov.bh",
    "com.om", "net.om", "org.om", "edu.om", "gov.om", "med.om",
    "com.jo", "net.jo", "org.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo",
    "sch.jo",
    "com.lb", "net.lb", "org.lb", "edu.lb", "gov.lb",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg", "eun.eg",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    "com.tn", "net.tn", "org.tn", "gov.tn", "edunet.tn", "ens.tn", "rns.tn",
    "com.dz", "net.dz", "org.dz", "edu.dz", "gov.dz", "art.dz", "pol.dz",
    "com.ly", "net.ly", "org.ly", "edu.ly", "gov.ly", "sch.ly", "med.ly",
    "plc.ly", "id.ly",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng", "name.ng",
    "mobi.ng", "i.ng",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz", "me.tz",
    "mobi.tz", "hotel.tz", "info.tz", "tv.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug", "com.ug",
    "org.ug",
    "com.et", "net.et", "org.et", "edu.et", "gov.et", "name.et", "info.et",
    "biz.et",
    "co.zm", "com.zm", "org.zm", "edu.zm", "gov.zm", "ac.zm", "sch.zm",
    "net.zm", "mil.zm",
    "co.zw", "org.zw", "gov.zw", "mil.zw", "ac.zw", "sch.zw",
    "co.za", "org.za", "net.za", "web.za", "ac.za", "gov.za", "edu.za",
    "mil.za", "nom.za", "school.za",
    "co.mz", "org.mz", "gov.mz", "edu.mz", "ac.mz", "net.mz",
    "co.na", "com.na", "org.na",
    "co.bw", "org.bw",
    // ---- Americas ----
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "adv.br", "eco.br", "blog.br", "eng.br", "esp.br", "etc.br", "far.br",
    "flog.br", "fnd.br", "fot.br", "g12.br", "ggf.br", "imb.br", "ind.br",
    "inf.br", "jor.br", "jus.br", "leg.br", "lel.br", "mat.br", "med.br",
    "mus.br", "not.br", "ntr.br", "odo.br", "ppg.br", "psc.br", "psi.br",
    "qsl.br", "radio.br", "rec.br", "slg.br", "srv.br", "taxi.br",
    "teo.br", "tmp.br", "trd.br", "tur.br", "vet.br", "vlog.br", "wiki.br",
    "zlg.br",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "musica.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "co.ve",
    "info.ve", "web.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "mil.bo", "int.bo",
    "tv.bo", "web.bo",
    "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "sld.do", "art.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "mil.gt", "ind.gt",
    "com.hn", "net.hn", "org.hn", "edu.hn", "gob.hn", "mil.hn",
    "com.ni", "net.ni", "org.ni", "edu.ni", "gob.ni", "mil.ni",
    "com.pa", "net.pa", "org.pa", "edu.pa", "gob.pa", "sld.pa", "ing.pa",
    "abo.pa", "med.pa", "nom.pa",
    "com.pr", "net.pr", "org.pr", "edu.pr", "gov.pr", "isla.pr", "pro.pr",
    "biz.pr", "info.pr", "name.pr", "est.pr", "prof.pr", "ac.pr",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.cu", "net.cu", "org.cu", "edu.cu", "gov.cu", "inf.cu",
    // ---- US states (PSL lists every <state>.us) ----
    "ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us", "dc.us",
    "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us", "il.us", "in.us",
    "ks.us", "ky.us", "la.us", "ma.us", "md.us", "me.us", "mi.us", "mn.us",
    "mo.us", "ms.us", "mt.us", "nc.us", "nd.us", "ne.us", "nh.us", "nj.us",
    "nm.us", "nv.us", "ny.us", "oh.us", "ok.us", "or.us", "pa.us", "ri.us",
    "sc.us", "sd.us", "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us",
    "wi.us", "wv.us", "wy.us",
    // ---- Europe second-level ----
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "katowice.pl", "poznan.pl",
    "lodz.pl", "gda.pl", "slask.pl", "mil.pl",
    "com.ru", "net.ru", "org.ru", "edu.ru", "int.ru", "ac.ru", "msk.ru",
    "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua", "dp.ua", "pp.ua",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "name.tr", "pol.tr", "tel.tr", "web.tr", "tv.tr",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "agrar.hu", "bolt.hu", "casino.hu", "city.hu", "erotica.hu",
    "film.hu", "forum.hu", "games.hu", "hotel.hu", "ingatlan.hu",
    "jogasz.hu", "konyvelo.hu", "lakas.hu", "media.hu", "news.hu",
    "reklam.hu", "sex.hu", "shop.hu", "suli.hu", "szex.hu", "tozsde.hu",
    "utazas.hu", "video.hu",
    "com.se", "org.se", "pp.se", "tm.se", "parti.se", "press.se",
    "priv.no", "mil.no", "stat.no", "fhs.no", "vgs.no",
    "com.cy", "net.cy", "org.cy", "ac.cy", "biz.cy", "ltd.cy", "press.cy",
    "pro.cy", "tm.cy", "name.cy", "ekloges.cy", "parliament.cy",
    "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "com.ge", "net.ge", "org.ge", "edu.ge", "gov.ge", "mil.ge", "pvt.ge",
    "com.az", "net.az", "org.az", "edu.az", "gov.az", "mil.az", "int.az",
    "biz.az", "info.az", "name.az", "pp.az", "pro.az",
    "com.by", "net.by", "org.by", "gov.by", "mil.by", "of.by",
    "com.kz", "net.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz",
    "com.md", "net.md", "org.md",
    // ---- wildcard + exception rules ----
    "*.ck", "!www.ck",
    "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // ---- IDN TLDs (Unicode form, as the PSL ships them) ----
    "рф", "укр", "срб", "бг", "ελ", "中国", "中國", "香港", "台湾", "台灣",
    "新加坡", "한국", "ไทย", "भारत", "مصر", "السعودية", "امارات", "قطر",
    "الاردن", "عمان", "ایران",
    // ---- remaining flat ccTLDs (islands, Africa, Caribbean) ----
    "ac", "ag", "ai", "aw", "bb", "bf", "bi", "bj", "bm", "bs", "bz",
    "cf", "cg", "cv", "cx", "dj", "dm", "gd", "gf", "gm", "gn", "gp",
    "gq", "gw", "gy", "ht", "jm", "ki", "km", "kn", "ky", "lc", "lr",
    "ls", "mf", "ml", "mp", "mq", "mr", "mv", "ne", "nf", "nr", "pm",
    "pn", "sl", "sr", "sx", "sz", "tc", "td", "tf", "tg", "tt", "vg",
    "vi", "wf", "yt", "bt",
    // ---- more second-level registries ----
    "com.bt", "edu.bt", "gov.bt", "net.bt", "org.bt",
    "com.mv", "edu.mv", "gov.mv", "net.mv", "org.mv", "aero.mv",
    "biz.mv", "coop.mv", "info.mv", "int.mv", "mil.mv", "museum.mv",
    "name.mv", "pro.mv",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "asso.fr", "nom.fr", "com.fr", "gouv.fr", "tm.fr", "avocat.fr",
    "aeroport.fr", "avoues.fr", "cci.fr", "chambagri.fr", "greta.fr",
    "medecin.fr", "notaires.fr", "pharmacien.fr", "port.fr", "prd.fr",
    "veterinaire.fr",
    "ac.be", "co.ao", "ed.ao", "gv.ao", "it.ao", "og.ao", "pb.ao",
    "com.ag", "net.ag", "org.ag", "nom.ag", "co.ag",
    "com.bz", "net.bz", "org.bz", "edu.bz", "gov.bz",
    "com.bs", "net.bs", "org.bs", "edu.bs", "gov.bs",
    "com.gy", "net.gy", "co.gy", "org.gy", "edu.gy", "gov.gy",
    "com.ht", "net.ht", "org.ht", "edu.ht", "gouv.ht", "firm.ht",
    "shop.ht", "info.ht", "pro.ht", "adult.ht", "art.ht", "asso.ht",
    "pol.ht", "rel.ht", "med.ht", "coop.ht", "perso.ht",
    "com.jm", "net.jm", "org.jm", "edu.jm", "gov.jm", "mil.jm",
    "com.tt", "net.tt", "org.tt", "edu.tt", "gov.tt", "biz.tt",
    "co.tt", "info.tt", "name.tt", "pro.tt",
    "com.vi", "net.vi", "org.vi", "co.vi", "k12.vi",
    "com.sl", "net.sl", "org.sl", "edu.sl", "gov.sl",
    "com.gn", "ac.gn", "gov.gn", "org.gn", "net.gn",
    "com.lr", "edu.lr", "gov.lr", "org.lr", "net.lr",
    "co.ls", "org.ls", "ac.ls", "gov.ls", "sc.ls", "net.ls",
    "com.mw", "net.mw", "org.mw", "edu.mw", "gov.mw", "ac.mw",
    "co.mw", "biz.mw", "coop.mw", "int.mw", "museum.mw",
    "com.sc", "net.sc", "org.sc", "edu.sc", "gov.sc",
    "com.mu", "net.mu", "org.mu", "co.mu", "or.mu", "ac.mu", "gov.mu",
    "com.mg", "net.mg", "org.mg", "edu.mg", "gov.mg", "mil.mg",
    "nom.mg", "prd.mg", "tm.mg", "co.mg",
    "co.rw", "net.rw", "org.rw", "ac.rw", "gov.rw", "mil.rw", "coop.rw",
    "com.sn", "net.sn", "org.sn", "edu.sn", "gouv.sn", "art.sn",
    "univ.sn", "perso.sn",
    "co.ci", "com.ci", "net.ci", "org.ci", "edu.ci", "ed.ci", "ac.ci",
    "go.ci", "or.ci", "int.ci", "md.ci", "gouv.ci",
    "com.cm", "net.cm", "co.cm", "gov.cm",
    "com.cd", "net.cd", "org.cd", "gov.cd",
    "com.fj", "net.fj", "org.fj", "ac.fj", "gov.fj", "mil.fj",
    "biz.fj", "info.fj", "name.fj", "pro.fj", "school.fj",
    "com.sb", "net.sb", "org.sb", "edu.sb", "gov.sb",
    "com.vu", "net.vu", "org.vu", "edu.vu",
    "gov.as", "com.ws", "net.ws", "org.ws", "gov.ws", "edu.ws",
    "nom.ad", "tm.mc", "asso.mc",
    // ---- more new gTLDs (2012+ rounds) ----
    "bar", "beauty", "boo", "boutique", "build", "builders", "business",
    "buzz", "cab", "cafe", "camera", "camp", "cards", "care", "career",
    "casa", "center", "chat", "cheap", "church", "city", "claims",
    "cleaning", "clinic", "clothing", "coach", "college", "community",
    "company", "construction", "consulting", "contractors", "cool",
    "coupons", "courses", "credit", "creditcard", "cruises", "dance",
    "dating", "day", "deals", "delivery", "democrat", "dental", "dentist",
    "diamonds", "diet", "direct", "discount", "doctor", "dog", "domains",
    "earth", "energy", "engineer", "engineering", "enterprises",
    "equipment", "events", "exchange", "exposed", "express", "fail",
    "faith", "family", "fans", "farm", "fashion", "film", "fish",
    "fitness", "flights", "florist", "flowers", "football", "forsale",
    "foundation", "fund", "furniture", "futbol", "fyi", "gallery",
    "garden", "gift", "gifts", "gives", "glass", "global", "gold",
    "golf", "graphics", "gratis", "gripe", "guide", "guitars", "haus",
    "health", "healthcare", "help", "hiphop", "hockey", "holdings",
    "holiday", "homes", "horse", "hospital", "house", "how", "immo",
    "industries", "insure", "international", "investments", "jewelry",
    "juegos", "kaufen", "kim", "kitchen", "kiwi", "lawyer", "lease",
    "lgbt", "lighting", "limited", "limo", "link", "loan", "loans",
    "lol", "love", "ltd", "luxury", "makeup", "management", "market",
    "marketing", "mba", "meme", "memorial", "men", "menu", "moda",
    "mom", "monster", "mortgage", "motorcycles", "mov", "movie", "new",
    "nexus", "ninja", "observer", "organic", "partners", "parts",
    "party", "pet", "phd", "photo", "photography", "photos", "pics",
    "pictures", "pizza", "place", "plumbing", "poker", "porn", "press",
    "productions", "prof", "properties", "property", "protection",
    "quest", "racing", "realty", "recipes", "rehab", "reise", "reisen",
    "rent", "rentals", "repair", "report", "republican", "rest",
    "restaurant", "review", "reviews", "rip", "rodeo", "rsvp", "salon",
    "sarl", "sbs", "science", "security", "select", "sexy", "shoes",
    "shopping", "singles", "skin", "soccer", "solar", "song", "soy",
    "spa", "sport", "stream", "style", "sucks", "supplies", "supply",
    "support", "surf", "surgery", "tattoo", "tax", "taxi", "tennis",
    "theater", "theatre", "tickets", "tips", "tires", "tirol", "town",
    "toys", "trade", "trading", "tube", "ventures", "vet", "viajes",
    "villas", "vin", "vision", "vodka", "vote", "voyage", "wang",
    "webcam", "wedding", "wine", "win", "work", "yoga", "zip",
    // ---- more IDN TLDs ----
    "қаз", "бел", "мон", "ею", "հայ", "გე", "澳門", "澳门",
    "السودان", "المغرب", "تونس", "الجزائر", "فلسطين", "پاکستان",
    "বাংলা", "இந்தியா", "சிங்கப்பூர்", "ලංகා",
    // ---- private-section registries (hosted platforms) ----
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com", "herokuapp.com", "herokussl.com",
    "netlify.app", "vercel.app", "now.sh", "web.app", "firebaseapp.com",
    "appspot.com", "azurewebsites.net", "cloudfront.net",
    "elasticbeanstalk.com", "s3.amazonaws.com", "*.compute.amazonaws.com",
    "*.compute-1.amazonaws.com", "pages.dev", "workers.dev", "r2.dev",
    "fly.dev", "onrender.com", "repl.co", "glitch.me", "readthedocs.io",
    "surge.sh", "neocities.org", "fastlylb.net", "azureedge.net",
    "cloudapp.azure.com", "trafficmanager.net", "ngrok.io",
    "myshopify.com", "wixsite.com", "weebly.com", "squarespace.com",
    "duckdns.org", "dyndns.org", "no-ip.org", "no-ip.com", "ddns.net",
    "webflow.io", "bubbleapps.io", "notion.site", "carrd.co",
    "pythonanywhere.com", "eu.pythonanywhere.com", "streamlit.app",
    "hf.space", "000webhostapp.com", "webhostapp.com", "wpenginepowered.com",
    "kinsta.cloud", "pantheonsite.io", "platformsh.site", "amplifyapp.com",
    "cloudflare-ipfs.com", "translate.goog", "cdn.ampproject.org",
    "codeberg.page", "deno.dev", "railway.app", "up.railway.app",
    "gitbook.io", "hashnode.dev", "substack.com", "ghost.io",
    "myftp.org", "serveo.net", "loca.lt", "beget.app")

  final case class Rules(
      exact: Set[String], wildcardBase: Set[String], exception: Set[String])

  /** Active rules: the complete `public_suffix_list.dat` is a pure data
    * drop-in — point the `graft.psl.file` system property (or the
    * GRAFT_PSL_FILE env var) at it and it replaces the embedded subset at
    * class-init (ship the file to executors with --files; the PSL format's
    * comments/blank lines are handled by loadRules). A CONFIGURED path
    * that cannot be read fails fast: silently falling back to the subset
    * would let a typo'd path (or a missing --files) corrupt base_domain
    * grouping without any signal. */
  val rules: Rules = {
    val external = sys.props.get("graft.psl.file").orElse(sys.env.get("GRAFT_PSL_FILE"))
      .map { p =>
        require(java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)),
          s"graft.psl.file/GRAFT_PSL_FILE points at unreadable path: $p")
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try src.getLines().toList finally src.close()
      }
    loadRules(external.getOrElse(embeddedRules))
  }

  /** Parse PSL lines into rule sets. Every rule is stored in BOTH its
    * Unicode and punycode (IDN toASCII) form: the PSL ships rules as
    * Unicode, but the domains this pipeline actually processes come from
    * X.509 SANs, which carry the punycoded (xn--) form — rules that only
    * matched Unicode input would be dead against real certificates. */
  def loadRules(lines: Seq[String]): Rules = {
    val cleaned = lines.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
    def punycode(rule: String): Option[String] =
      try {
        val ascii = rule.split('.')
          .map(l => if (l == "*") l else java.net.IDN.toASCII(l)).mkString(".")
        if (ascii != rule) Some(ascii) else None
      } catch { case _: Throwable => None }
    def forms(rs: Seq[String]): Set[String] = (rs ++ rs.flatMap(punycode)).toSet
    Rules(
      exact = forms(cleaned.filterNot(l => l.startsWith("*.") || l.startsWith("!"))),
      wildcardBase = forms(cleaned.filter(_.startsWith("*.")).map(_.drop(2))),
      exception = forms(cleaned.filter(_.startsWith("!")).map(_.drop(1))))
  }

  /** Registrable domain of `d` per the PSL algorithm; null in → null out. */
  def baseDomain(d: String): String = baseDomain(d, rules)

  def baseDomain(domainRaw: String, r: Rules): String = {
    if (domainRaw == null) return null
    val d = domainRaw.toLowerCase.stripPrefix(".").stripSuffix(".")
    if (d.isEmpty) return d
    val labels = d.split('.')
    val n = labels.length
    // Find the longest matching public suffix, scanning longest-first.
    // suffixStart = index of the first label of the public suffix.
    var suffixStart = n - 1 // default rule "*": last label
    var i = 0
    var found = false
    while (i < n && !found) {
      val s = labels.slice(i, n).mkString(".")
      val parent = if (i + 1 <= n) labels.slice(i + 1, n).mkString(".") else ""
      if (r.exception.contains(s)) {
        // exception rule: public suffix is the rule minus its first label
        suffixStart = i + 1; found = true
      } else if (r.exact.contains(s)) {
        suffixStart = i; found = true
      } else if (parent.nonEmpty && r.wildcardBase.contains(parent)) {
        // rule *.parent matches s (= one label + parent)
        suffixStart = i; found = true
      } else i += 1
    }
    // registrable domain = public suffix plus one preceding label;
    // bare suffix → the suffix itself (reference publicsuffix2 behavior).
    val regStart = math.max(suffixStart - 1, 0)
    labels.slice(regStart, n).mkString(".")
  }

  /** Column-level form for the ingest pipeline. A plain Scala UDF is
    * deliberate (SURVEY §2.11): it runs once per ingested row, not in the
    * query hot path; upgrade to a codegen Expression only if profiling
    * demands. */
  val baseDomainUdf = udf((d: String) => baseDomain(d))

  def base_domain(c: Column): Column = baseDomainUdf(c)
}
